"""Arrow schemas for stage outputs.

The reference's dynamic ``Doc`` extensions become fixed, declared
pyarrow types here (SURVEY.md §1.2): each stage appends typed columns to the
document table.
"""

import pyarrow as pa

MENTION_TYPE = pa.struct(
    [
        ("start_char", pa.int32()),
        ("end_char", pa.int32()),
        ("start_tok", pa.int32()),
        ("end_tok", pa.int32()),
        ("label", pa.string()),
        ("text", pa.string()),
        ("kb_id", pa.string()),
    ]
)

REL_TYPE = pa.struct(
    [
        ("dep", pa.int32()),
        ("dest", pa.int32()),
        ("relation", pa.string()),
    ]
)

# save_io capture (reference: Doc.user_data["llm_io"], pipeline/llm.py:296-314)
LLM_IO_TYPE = pa.struct(
    [
        ("prompt", pa.list_(pa.string())),
        ("response", pa.list_(pa.string())),
    ]
)

TRIPLE_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("subj", pa.string()),
        ("subj_label", pa.string()),
        ("subj_qid", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("obj_label", pa.string()),
        ("obj_qid", pa.string()),
    ]
)
