"""Every registered query matches its DuckDB oracle at sf0.001 (fast local
mirror of the driver's CORRECTNESS gate; tools/check_correctness.py runs the
same comparison at sf0.01)."""

import duckdb
import pytest

from cloudtile_spark.queries import REGISTRY, TABLES

from tests.conftest import SF_DIR

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from check_correctness import table_hash  # noqa: E402


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, duck, name):
    q = REGISTRY[name]
    sdf = q.spark_fn(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = [c.lower() for c in sdf.columns]
    assert len(srows) > 0, "query returned no rows"
    if not q.oracle:
        return
    res = duck.execute(q.oracle)
    dcols = [d[0].lower() for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols)
    sh, sn = table_hash(scols, srows)
    dh, dn = table_hash(dcols, drows)
    assert sn == dn, f"rowcount {sn} vs {dn}"
    assert sh == dh, "value hash mismatch"
