"""Registry-resolved model scoring (reference: PredictUdf.java,
MlflowModelResolver.java — SURVEY.md U1-U3).

The reference's `predict` UDF scores one row per call: resolve the
"Production"-stage model by name (cached after first fetch,
PredictUdf.java:43-45), build params = strings ++ ints in signature order
(:48-54), wrap in a 1-row MLeap LeapFrame (:55-57), return the output
column, NULL on any error (:60-63).

Spark-native translation: scoring is a *DataFrame* operator —
``PipelineModel.transform`` over the whole frame (the UDF's per-row
LeapFrame was only ever simulating this one row at a time). The API
preserves the UDF's contract:

- model resolved by (name, stage) from a registry dir, cached per process
  (the ConcurrentHashMap at PredictUdf.java:33 becomes a module-level dict);
- inputs arrive as an array<string> + array<int> pair in signature order
  (README.md:68 ``predict('Bot Detector', as_array(...), as_array(...))``);
- signature types are validated/coerced exactly like
  MlflowModelResolver.java:62-76 (string→string, integer/long→int,
  anything else → error);
- scoring failure → NULL prediction, query survives.

Scale notes: transform-based scoring is a narrow map stage — no shuffle,
stays in the JVM (the tree model is a Catalyst-evaluable pipeline), and
broadcasts the (small) model to every executor once.
"""

from __future__ import annotations

import json
import os

from pyspark.ml import PipelineModel
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["resolve_model", "score", "predict_arrays", "clear_model_cache"]

DEFAULT_MODELS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "models",
)

# name → (model, signature); per-process lazy cache
# (reference: PredictUdf.java:33,43-45).
_CACHE: dict[tuple[str, str], tuple[PipelineModel, dict]] = {}


def clear_model_cache() -> None:
    _CACHE.clear()


def resolve_model(
    name: str, stage: str = "Production", models_dir: str | None = None
) -> tuple[PipelineModel, dict]:
    """Resolve a named+staged model from the local registry
    (reference: MlflowModelResolver.java:44-56,115-117 — stage-resolved
    lazy fetch, cached)."""
    key = (name, stage)
    if key not in _CACHE:
        # Registry display names allow spaces/case ('Bot Detector',
        # reference README.md:68); the on-disk registry uses normalized
        # directory names.
        dir_name = name.replace(" ", "_").lower()
        root = os.path.join(models_dir or DEFAULT_MODELS_DIR, dir_name, stage)
        model = PipelineModel.load(os.path.join(root, "model"))
        with open(os.path.join(root, "MLmodel.json")) as f:
            signature = json.load(f)["signature"]
        _CACHE[key] = (model, signature)
    return _CACHE[key]


def _coerce(col: Column, typ: str, name: str) -> Column:
    """Signature type mapping (reference: MlflowModelResolver.java:62-76):
    string→string, integer/long→int, anything else is an error."""
    if typ == "string":
        return col.cast("string").alias(name)
    if typ in ("integer", "long"):
        return col.cast("int").alias(name)
    raise ValueError(f"Unsupported signature type for {name}: {typ}")


def score(
    df: DataFrame,
    model_name: str,
    *,
    stage: str = "Production",
    models_dir: str | None = None,
    output_col: str = "prediction",
) -> DataFrame:
    """Score a DataFrame whose columns already match the model signature by
    name — the preferred whole-frame path (SURVEY.md U2 option 1)."""
    model, signature = resolve_model(model_name, stage, models_dir)
    sig_names = {s["name"] for s in signature["inputs"]}
    prepared = df.select(
        *[F.col(c) for c in df.columns if c not in sig_names],
        *[_coerce(F.col(s["name"]), s["type"], s["name"]) for s in signature["inputs"]],
    )
    out_name = signature["outputs"][0]["name"]
    scored = model.transform(prepared)
    return scored.select(*df.columns, F.col(out_name).alias(output_col))


def predict_arrays(
    df: DataFrame,
    model_name: str,
    str_array_col: str,
    int_array_col: str,
    *,
    stage: str = "Production",
    models_dir: str | None = None,
    output_col: str = "prediction",
) -> DataFrame:
    """API-parity form of the reference UDF
    (README.md:68: ``predict('Bot Detector', as_array(country, platform),
    as_array(product_views, ...))``): inputs are an array<string> and an
    array<int> whose elements are *positional* against the signature
    (PredictUdf.java:48-56 — strings first, then ints, signature order).

    Rows whose arrays are null / too short / null-elemented score as NULL
    (error→NULL, PredictUdf.java:60-63) — implemented as a validity
    predicate + dummy fill so the whole frame still scores in one JVM pass
    rather than per-row try/except, and the model never sees nulls.
    """
    model, signature = resolve_model(model_name, stage, models_dir)
    str_names = [s["name"] for s in signature["inputs"] if s["type"] == "string"]
    int_names = [s["name"] for s in signature["inputs"] if s["type"] != "string"]

    # F.get (not getItem): out-of-bounds must yield NULL, not an ANSI
    # INVALID_ARRAY_INDEX error — NULLs then trip the validity predicate.
    raw_str = [F.get(F.col(str_array_col), i) for i in range(len(str_names))]
    raw_int = [
        F.get(F.col(int_array_col), i).cast("int") for i in range(len(int_names))
    ]
    valid = (
        F.col(str_array_col).isNotNull()
        & (F.size(str_array_col) >= len(str_names))
        & F.col(int_array_col).isNotNull()
        & (F.size(int_array_col) >= len(int_names))
    )
    for c in raw_str + raw_int:
        valid = valid & c.isNotNull()

    exploded = df.withColumn("__valid", valid)
    for n, c in zip(str_names, raw_str):
        exploded = exploded.withColumn(n, F.coalesce(c, F.lit("UNKNOWN")))
    for n, c in zip(int_names, raw_int):
        exploded = exploded.withColumn(n, F.coalesce(c, F.lit(0)))

    out_name = signature["outputs"][0]["name"]
    scored = model.transform(exploded)
    result = scored.withColumn(
        output_col,
        F.when(F.col("__valid"), F.col(out_name)).otherwise(F.lit(None).cast("string")),
    )
    return result.select(*df.columns, output_col)
