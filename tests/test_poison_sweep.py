"""Cross-engine POISON sweep (r13): the hygiene-hardened queries must
match their oracles on a corpus that actually contains the poison their
filters exist for — NULL rows, ragged rows, element-level NULL/NaN.

The r13 review observed that the hygiene predicates pass vacuously on
the shipped testdata (no poison rows exist at any sf); this fixture
injects every poison class into a copy of the sf0.01 embeddings table
and runs the full Spark-vs-DuckDB differential on it, so the
both-engines-filter-identically contract is continuously exercised
rather than asserted."""

from __future__ import annotations

import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from streaming_ml_with_ksql_spark.io import TABLES

from .oracle import assert_query_matches

HARDENED = [
    "embedding_topk_lsh",
    "embedding_topk_ivf",
    "embedding_topk_pq",
    "embedding_topk_ivfpq",
]


@pytest.fixture(scope="module")
def poisoned_sf(sf_medium, tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("poison_sf")
    for t in TABLES:
        shutil.copy(f"{sf_medium}/{t}.parquet", d / f"{t}.parquet")
    tbl = pq.read_table(d / "embeddings.parquet")
    max_id = pa.compute.max(tbl["vec_id"]).as_py()
    dim = len(tbl["embedding"][0])
    base = [0.1] * (dim - 1)
    poison = pa.table(
        {
            "vec_id": pa.array(
                [max_id + i for i in range(1, 5)], type=tbl.schema[0].type
            ),
            "embedding": pa.array(
                [
                    None,  # NULL row
                    [0.25, -0.125, 0.5],  # ragged row
                    base + [float("nan")],  # NaN element
                    base + [None],  # NULL element
                ],
                type=tbl.schema[1].type,
            ),
            "label": pa.array([0, 0, 0, 0], type=tbl.schema[2].type),
        }
    )
    pq.write_table(
        pa.concat_tables([tbl, poison]), d / "embeddings.parquet"
    )
    return str(d)


@pytest.mark.parametrize("name", HARDENED)
def test_hardened_query_matches_oracle_on_poisoned_corpus(
    spark, poisoned_sf, name
):
    assert_query_matches(spark, name, poisoned_sf)
