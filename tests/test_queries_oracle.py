"""Every registered query vs its DuckDB oracle — the same gate the
driver runs (row count + schema + order-insensitive values).

Marked slow (deselected by default, see pytest.ini): 560 parametrized
cases dominate the suite wall and the driver's pytest budget; the
identical gate runs standalone via scripts/driver_sim.py and at every
round close. Run with `pytest -m slow tests/test_queries_oracle.py`.
"""

from __future__ import annotations

import pytest

from bireme_spark import registry
from tests.oracle_util import compare, duck_con

pytestmark = pytest.mark.slow


def _cases():
    qs = registry.queries()
    oracle = registry.oracle_sql()
    return [(name, qs[name], oracle.get(name)) for name in sorted(qs)]


@pytest.mark.parametrize("name,fn,sql", _cases(), ids=[c[0] for c in _cases()])
def test_query_matches_oracle(spark, sf_dir, name, fn, sql):
    df = fn(spark, sf_dir)
    if sql is None:
        # Rows-only gate — but run the driver's pandas canonicalizer
        # (sort_values over EVERY column) so an unsortable output
        # column (array/map/struct → unhashable list) fails HERE, not
        # at the real gate (r4: embedding_pca_project).
        pdf = df.toPandas()
        if len(pdf.columns):
            pdf.sort_values(by=list(pdf.columns), kind="mergesort")
        assert len(pdf) >= 0
        return
    con = duck_con(sf_dir)
    ok, msg = compare(df, con, sql)
    assert ok, f"{name}: {msg}"
