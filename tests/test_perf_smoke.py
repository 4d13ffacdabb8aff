"""Perf smoke: the reference's own micro-benchmark pipeline
(``/root/reference/tests.py:146-180`` — build a 100k-row 4-column table,
mask ``(price+5.0>10.0) & (sales>3) & ~taxed``, project ``SKU``) run
through the MiniFrame veneer, validated row-for-row against pandas and
bounded in wall-clock so regressions in the veneer's local-list path are
caught (BASELINE.md records 2.37s for this exact pipeline; crossover vs
the reference is at ~1M rows).

Marker-gated: deselect with ``-m "not perf"`` if the suite must stay
fast; the bound is deliberately loose (external load on this box is
bursty, BASELINE.md measurement note).
"""

import random
import string
import time

import pandas as pd
import pytest

N_ROWS = 100_000
# Veneer cost recorded in BASELINE.md: 0.64s construct + 1.73s query.
# 15x headroom for load bursts — this catches order-of-magnitude
# regressions (an accidental eager path, a per-row UDF), not jitter.
WALL_CLOCK_BOUND_SEC = 35.0


def _fixture_dict() -> dict:
    rng = random.Random(7)
    return {
        "SKU": [
            "".join(rng.choices(string.ascii_uppercase + string.digits, k=3))
            for _ in range(N_ROWS)
        ],
        "price": [rng.uniform(0, 10) for _ in range(N_ROWS)],
        "sales": [rng.randint(0, 100) for _ in range(N_ROWS)],
        "taxed": [rng.choice([True, False]) for _ in range(N_ROWS)],
    }


@pytest.mark.perf
def test_reference_micro_benchmark_pipeline(spark):
    from mini_pandas_spark import MiniFrame

    data = _fixture_dict()

    t0 = time.time()
    df = MiniFrame.from_dict(spark, data)
    mask = (df["price"] + 5.0 > 10.0) & (df["sales"] > 3) & ~df["taxed"]
    got = df.apply_mask(mask)["SKU"].to_list()
    elapsed = time.time() - t0

    pdf = pd.DataFrame(data)
    pmask = (pdf["price"] + 5.0 > 10.0) & (pdf["sales"] > 3) & ~pdf["taxed"]
    want = pdf[pmask]["SKU"].tolist()

    assert got == want  # identical rows in identical order
    assert elapsed < WALL_CLOCK_BOUND_SEC, (
        f"veneer micro-benchmark took {elapsed:.1f}s (bound "
        f"{WALL_CLOCK_BOUND_SEC}s; BASELINE.md steady-state is ~2.4s) — "
        "check for an eager/per-row regression in the local-list path"
    )
