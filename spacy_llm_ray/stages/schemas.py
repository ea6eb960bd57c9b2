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


# --------------------------------------------------------------------------
# Plan-time schema-chain validation (reference analog: ty.py:344-449 checks
# task<->model type consistency before running; here each stage declares the
# columns it consumes and produces, and a chain is validated BEFORE any Ray
# execution so e.g. a RelStage over a dataset with no `mentions` column
# fails at build, not mid-run).

#: stage class name -> (required input columns, provided output columns)
STAGE_IO = {
    "NerStage": ({"text"}, {"mentions"}),
    "RelStage": ({"text", "mentions"}, {"relations"}),
    "ElStage": ({"text", "mentions"}, set()),          # rewrites mentions
    "KGStage": ({"conv_id", "text"}, {"mentions", "relations"}),
    "LLMTaskStage": ({"text"}, set()),                  # provides its out_col
}


def stage_io(stage) -> tuple:
    """(requires, provides) for a stage instance, honoring per-instance
    column overrides (text_col / mentions_col / out_col)."""
    name = type(stage).__name__
    req, prov = STAGE_IO.get(name, (set(), set()))
    req = set(req)
    prov = set(prov)
    text_col = getattr(stage, "_text_col", None)
    if text_col and "text" in req:
        req.discard("text")
        req.add(text_col)
    mcol = getattr(stage, "_mentions_col", None)
    if mcol and "mentions" in req:
        req.discard("mentions")
        req.add(mcol)
    out_col = getattr(stage, "_out_col", None)
    if out_col:
        prov.add(out_col)
    return req, prov


def validate_chain(stages, input_columns) -> None:
    """Walk a stage chain over an input schema; raise ValueError naming the
    first stage whose required columns are not produced upstream."""
    available = set(input_columns)
    for i, stage in enumerate(stages):
        req, prov = stage_io(stage)
        missing = req - available
        if missing:
            raise ValueError(
                f"schema chain invalid at stage {i} "
                f"({type(stage).__name__}): requires column(s) "
                f"{sorted(missing)} but upstream provides only "
                f"{sorted(available)}"
            )
        available |= prov
