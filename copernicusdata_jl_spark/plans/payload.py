"""O1–O9: TOML-payload orchestrator — the Spark re-expression of the
reference's ``EOTriggering`` module (reference src/EOTriggering.jl:83-195).

A payload declares a workflow (ordered processing units over named inputs
with parameters and auxiliary data files), I/O products, breakpoints, and
logging — the reference's "query plan". Differences by design:

- processing units are Python callables ``fn(inputs: list[DataTree], adfs:
  dict, spark=..., **kwargs) -> DataTree`` resolved via importlib
  (O4's ``getfield(Main, Symbol(mod))``, src/EOTriggering.jl:171-191);
- ADFs are JSON trees loaded driver-side and passed as plain dicts — the
  broadcast-lookup shape (O6, src/EOTriggering.jl:156-168);
- unit outputs chain into later units' inputs by name (the reference
  declares this a TODO at src/EOTriggering.jl:147-150; here it works);
- breakpoints write each related unit's output tree to ``storage`` and a
  lineage snapshot to a checkpoint table; a re-run skips completed units
  whose breakpoint output already exists (O8 → ☆idempotent resume,
  the north rule's per-partition granularity lives in
  operators/lineage.run_with_resume for intra-stage resume).

Ship-to-cluster contract: ``python -m copernicusdata_jl_spark.plans.payload
payload.toml`` after ``spark-submit --py-files copernicusdata_jl_spark.zip``
(the __spark_entry__ _ensure_shipped mechanism packages the zip).
"""

from __future__ import annotations

import importlib
import json
import logging
import os
import tomllib
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from ..sources.datatree import DataTree, open_datatree, open_json_datatree

log = logging.getLogger("copernicusdata_jl_spark.payload")

REQUIRED_TAGS = ["workflow", "I/O", "breakpoints", "logging"]


@dataclass
class PayloadWorkflow:
    """One processing unit (reference struct src/EOTriggering.jl:25-37)."""

    module: str
    processing_unit: str
    name: str
    inputs: list[str]
    parameters: dict = field(default_factory=dict)
    aux_files: list[dict] = field(default_factory=list)


@dataclass
class Payload:
    workflow: list[PayloadWorkflow]
    inputs_products: list[dict]
    breakpoints: dict
    logging: dict
    parallel_context: dict = field(default_factory=dict)


def parse_payload_file(path: str) -> dict:
    """O2 (reference src/EOTriggering.jl:49-51)."""
    with open(path, "rb") as f:
        return tomllib.load(f)


def get_logging_level(payload: dict) -> int:
    """O3 (reference src/EOTriggering.jl:53-65)."""
    level = str(payload.get("logging", {}).get("level", "info")).upper()
    return getattr(logging, level, logging.INFO)


def validate(payload: dict) -> Payload:
    """Required-tag check (O1, reference src/EOTriggering.jl:106-110) +
    unit validation into PayloadWorkflow structs (:137-143)."""
    missing = [t for t in REQUIRED_TAGS if t not in payload]
    if missing:
        raise ValueError(f"payload missing required tags: {missing}")
    units = []
    for u in payload["workflow"]:
        units.append(
            PayloadWorkflow(
                module=u["module"],
                processing_unit=u["processing_unit"],
                name=u["name"],
                inputs=list(u.get("inputs", [])),
                parameters=dict(u.get("parameters", {})),
                aux_files=list(u.get("aux_files", [])),
            )
        )
    return Payload(
        workflow=units,
        inputs_products=list(payload["I/O"].get("inputs_products", [])),
        breakpoints=dict(payload["breakpoints"]),
        logging=dict(payload["logging"]),
        parallel_context=dict(payload.get("parallel_context", {})),
    )


def resolve_processing_unit(module: str, fn_name: str):
    """O4: dynamic resolution, error on unknown/non-callable (reference
    src/EOTriggering.jl:171-191)."""
    try:
        mod = importlib.import_module(module)
    except ImportError as e:
        raise ValueError(f"unknown processing module {module!r}") from e
    fn = getattr(mod, fn_name, None)
    if not callable(fn):
        raise ValueError(f"{module}.{fn_name} is not a callable processing unit")
    return fn


def load_adfs(aux_files: list[dict]) -> dict[str, DataTree]:
    """O6: pop aux files, key by id (reference src/EOTriggering.jl:156-168).
    JSON ADF trees are tiny driver-side config — the broadcast side."""
    return {a["id"]: open_json_datatree(a["path"]) for a in aux_files}


def processor_run(fn, inputs: list[DataTree], adfs: dict, spark: SparkSession, **kwargs) -> DataTree:
    """O5: uniform call contract with error trap (reference
    src/EOTriggering.jl:67-81)."""
    try:
        return fn(inputs, adfs, spark=spark, **kwargs)
    except Exception:
        log.exception("processing unit %s failed", getattr(fn, "__name__", fn))
        raise


def run(payload_path: str, spark: SparkSession | None = None) -> dict[str, DataTree]:
    """O1: parse → validate → bind inputs → execute units in order,
    chaining outputs; breakpoint units persist + resume."""
    raw = parse_payload_file(payload_path)
    logging.basicConfig(level=get_logging_level(raw))
    payload = validate(raw)

    if spark is None:
        from ..session import get_spark

        n = payload.parallel_context.get("processes")
        spark = get_spark(app_name="payload", master=f"local[{n}]" if n else None)

    base = os.path.dirname(os.path.abspath(payload_path))

    def _abs(p: str) -> str:
        return p if os.path.isabs(p) else os.path.join(base, p)

    # bind inputs (O1 input loop, reference src/EOTriggering.jl:119-126)
    products: dict[str, DataTree] = {}
    for spec in payload.inputs_products:
        products[spec["id"]] = open_datatree(
            spark,
            _abs(spec["path"]),
            driver=spec.get("store_type"),
            name=spec["id"],
            group=spec.get("group"),
        )

    bp = payload.breakpoints
    bp_units = set(bp.get("related_unit", []))
    storage = _abs(bp["storage"]) if bp.get("storage") else None

    outputs: dict[str, DataTree] = {}
    for unit in payload.workflow:
        out_dir = os.path.join(storage, unit.name) if storage else None
        if out_dir and unit.name in bp_units and os.path.isdir(out_dir):
            # O8 resume: completed breakpoint → reload, skip recompute
            from ..sources.datatree import open_parquet_datatree

            log.info("unit %s: breakpoint exists, resuming from %s", unit.name, out_dir)
            outputs[unit.name] = products[unit.name] = open_parquet_datatree(spark, out_dir, unit.name)
            continue
        ins = [products[i] for i in unit.inputs if i in products]
        adfs = load_adfs([{**a, "path": _abs(a["path"])} for a in unit.aux_files])
        fn = resolve_processing_unit(unit.module, unit.processing_unit)
        log.info("unit %s: running %s.%s", unit.name, unit.module, unit.processing_unit)
        result = processor_run(fn, ins, adfs, spark=spark, **unit.parameters)
        outputs[unit.name] = result
        products[unit.name] = result  # chain to later units by name
        if out_dir and unit.name in bp_units:
            result.to_parquet(out_dir, mode="overwrite")
    return outputs


def main() -> None:  # pragma: no cover - thin CLI
    import sys

    run(sys.argv[1])


if __name__ == "__main__":  # pragma: no cover
    main()
