"""Stage registry — the declarative pipeline compiler.

The reference instantiates its transform pipeline from a YAML list of
``{OpName: {params}}`` via a registry
(reference: mindocr/data/transforms/transforms_factory.py:18-52,
mindocr/postprocess/builder.py:19-45). Here the registry maps stage names
to DataFrame→DataFrame factories and ``build_pipeline`` compiles a stage
list into a chained plan — Catalyst is the interpreter
(reference's run_transforms, transforms_factory.py:55-68, has no analog:
the chain *is* the logical plan).
"""

from __future__ import annotations

from typing import Callable

from mindocr_spark import extract_core as core
from mindocr_spark.operators import stages as S

STAGE_REGISTRY: dict[str, Callable] = {
    "parse": S.parse_stage,
    "score": S.score_stage,
    "detect": S.detect_stage,
    "assemble": S.assemble_stage,
    "extract": S.extract_stage,  # fused parse+score+detect+assemble
}

#: The canonical staged plan (≡ fused "extract").
DEFAULT_PLAN = ["parse", "score", "detect", "assemble"]


def build_pipeline(
    plan: list[str | dict] | None = None,
    params: core.ExtractParams = core.DEFAULT_PARAMS,
) -> Callable:
    """Compile a stage-name list into a DataFrame transformer.

    Entries may be ``"name"`` or ``{"name": {param overrides}}`` —
    the YAML shape of the reference's transform lists.
    """
    plan = plan or DEFAULT_PLAN

    def run(df):
        for entry in plan:
            if isinstance(entry, dict):
                (name, overrides), = entry.items()
                p = core.ExtractParams(**{**params.__dict__, **(overrides or {})})
            else:
                name, p = entry, params
            if name not in STAGE_REGISTRY:
                raise KeyError(f"unknown stage {name!r}; have {sorted(STAGE_REGISTRY)}")
            df = STAGE_REGISTRY[name](df, p)
        return df

    return run
