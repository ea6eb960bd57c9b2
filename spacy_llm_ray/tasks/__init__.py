from .span import (  # noqa: F401
    SpanReason,
    SpanTaskConfig,
    parse_span_response,
    parse_span_response_cot,
)
from .rel import preannotate, parse_rel_response, RelationItem  # noqa: F401
from .entity_linker import (  # noqa: F401
    NIL,
    highlight_mentions,
    parse_el_solutions,
    resolve_el_response,
)
from .textcat import TextCatConfig, parse_textcat_response  # noqa: F401
from .lemma import parse_lemma_response  # noqa: F401
from .sentiment import parse_sentiment_response  # noqa: F401
from .summarization import parse_summarization_response  # noqa: F401
from .translation import parse_translation_response  # noqa: F401
from .raw import parse_raw_response  # noqa: F401
from .sharding import count_tokens_by_spaces, make_shard_mapper, Shard  # noqa: F401
