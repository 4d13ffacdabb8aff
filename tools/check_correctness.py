#!/usr/bin/env python
"""Local mimic of the driver's correctness gate: run each registered query
on Spark and its oracle on DuckDB at sf0.01, compare row count, column
names, and order-insensitive values (exact for ints/strings, repr-exact for
floats — if this passes, any reasonable value-hash passes too).

Usage: python tools/check_correctness.py [query ...]
       python tools/check_correctness.py --changed-since <rev>

``--changed-since <rev>`` (VERDICT_r10 item 8: the 368-entry full sweep
is ~15 min and growing) sweeps only queries plausibly affected by the
diff against <rev>: queries whose implementing module changed, plus
queries whose register() block in queries.py changed.  A diff touching
shared plumbing (sources/, functions.py, session.py, memo.py, frame.py,
plans/) falls back to the FULL sweep — selection is only ever an
over-approximation, never a shortcut past shared-code changes.  The
full no-argument sweep remains the round gate.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if v is None:
        return "<null>"
    return str(v)


def norm_cell_pd(v):
    """Normalize a cell fetched through pandas (``rel.df()``), the way the
    grading driver sees oracle values.  DuckDB HUGEINT (any SUM over an
    integer column) and DECIMAL become float64/object here — if the Spark
    side is int64, repr diverges (``99111.0`` vs ``99111``) even though
    fetchall() compares equal.  This path catches that hazard class.

    Known driver-equivalences (observed from green CORRECTNESS rows):
    NaN from pandas' nullable-int-to-float promotion hashes like NULL
    (window_running_sum was driver-green with NULL lag frames), and numpy
    arrays are plain sequences — so normalize both rather than flag them."""
    import numpy as np  # local: keep module import-light

    if v is None:
        return "<null>"
    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, list):
        return str([x.item() if isinstance(x, np.generic) else x for x in v])
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return "<null>"  # pandas NaN stands in for SQL NULL
        return repr(v)
    try:
        import pandas as pd

        if v is pd.NaT:
            return "<null>"
    except Exception:
        pass
    return str(v)


def norm_rows_pd(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell_pd(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def norm_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def _registration_blocks(src: str) -> dict[str, str]:
    """Map registered query name -> its register(...) call text, by
    splitting queries.py source on top-level ``register(`` calls and
    reading each block's first string literal as the name.  Textual on
    purpose: importing a historical queries.py would execute it."""
    import re

    blocks: dict[str, str] = {}
    for m in re.finditer(r"^register\(", src, flags=re.MULTILINE):
        start = m.start()
        nxt = re.search(r"^register\(", src[m.end():], flags=re.MULTILINE)
        end = m.end() + (nxt.start() if nxt else len(src) - m.end())
        block = src[start:end]
        name_m = re.search(r"register\(\s*['\"]([^'\"]+)['\"]", block)
        if name_m:
            blocks[name_m.group(1)] = block.strip()
    return blocks


def _changed_since(rev: str, qs: dict) -> set[str] | None:
    """Names affected by the diff vs ``rev``; None ⇒ run the full sweep
    (shared plumbing changed, or the diff could not be read)."""
    import inspect
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        out = subprocess.run(
            ["git", "diff", "--name-only", rev, "--", "mini_pandas_spark/"],
            cwd=repo, capture_output=True, text=True, check=True,
        ).stdout
    except subprocess.CalledProcessError as e:
        print(f"note: git diff vs {rev!r} failed ({e.stderr.strip()}); "
              "running FULL sweep")
        return None
    changed = [ln.strip() for ln in out.splitlines() if ln.strip()]
    if not changed:
        return set()
    # Shared plumbing ⇒ everything is suspect: full sweep.
    op_prefixes = ("mini_pandas_spark/operators/",
                   "mini_pandas_spark/streaming/",
                   "mini_pandas_spark/multimodal/")
    for f in changed:
        if f != "mini_pandas_spark/queries.py" and not f.startswith(op_prefixes):
            print(f"note: shared file {f} changed; running FULL sweep")
            return None
    selected: set[str] = set()
    changed_set = set(changed)
    for name, fn in qs.items():
        try:
            src_file = inspect.getsourcefile(inspect.unwrap(fn)) or ""
        except TypeError:
            src_file = ""
        rel = os.path.relpath(src_file, repo) if src_file else ""
        if rel in changed_set:
            selected.add(name)
    if "mini_pandas_spark/queries.py" in changed_set:
        now = open(os.path.join(repo, "mini_pandas_spark/queries.py")).read()
        try:
            old = subprocess.run(
                ["git", "show", f"{rev}:mini_pandas_spark/queries.py"],
                cwd=repo, capture_output=True, text=True, check=True,
            ).stdout
        except subprocess.CalledProcessError:
            old = ""
        nb, ob = _registration_blocks(now), _registration_blocks(old)
        selected |= {n for n, blk in nb.items() if ob.get(n) != blk}
    # The in-sweep LSH≡exact pin needs both pair queries when either runs.
    if selected & {"minhash_lsh_pairs", "ngram_jaccard_pairs"}:
        selected |= {"minhash_lsh_pairs", "ngram_jaccard_pairs"}
    return selected


def main() -> int:
    from mini_pandas_spark.queries import oracle_sql, queries
    from mini_pandas_spark.session import get_spark

    args = sys.argv[1:]
    qs, oracles = queries(), oracle_sql()
    if args[:1] == ["--changed-since"]:
        if len(args) < 2:
            print("usage: check_correctness.py --changed-since <rev>")
            return 2
        sel = _changed_since(args[1], qs)
        if sel is None:
            only = set()
        elif not sel:
            print(f"ok   no registered query affected since {args[1]}")
            return 0
        else:
            print(f"note: {len(sel)} queries affected since {args[1]}: "
                  + " ".join(sorted(sel)))
            only = sel
    else:
        only = set(args)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    spark = get_spark("correctness-check", cpus=8, shuffle_partitions=16)
    failures = 0
    # The LSH≡exact pin underwrites FOUR oracles (neardup_flow_matrix,
    # neardup_survivors_quality, neardup_cluster_sizes,
    # incremental_neardup_lsh all source pairs from minhash_lsh_pairs but
    # keep exact-Jaccard DuckDB oracles).  Capture both pair sets as the
    # sweep runs them and cross-assert afterwards, so a band/row-count
    # retune cannot land without re-proving the equality here, not just
    # in pytest (ADVICE r5).
    pair_sets: dict[str, set] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            failures += 1
            continue
        if name in ("ngram_jaccard_pairs", "minhash_lsh_pairs"):
            cols = {c: i for i, c in enumerate(scols)}
            pair_sets[name] = {
                (r[cols["doc_a"]], r[cols["doc_b"]]) for r in srows
            }
        # Driver-hashability lint: the grading driver canonicalizes by
        # pandas sort_values + value hash, which crashes on Array/Map/
        # Struct outputs (round-2 red row pca_project_embeddings).  This
        # covers EVERY query incl. streaming drains the pytest lint skips.
        from pyspark.sql.types import ArrayType, MapType, StructType

        nonatomic = [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in sdf.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if nonatomic:
            print(f"FAIL {name}: non-atomic output columns {nonatomic}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s) [no oracle]")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = list(rel.columns)
            drows = [tuple(r) for r in rel.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            failures += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"row count {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns {sorted(scols)} vs {sorted(dcols)}")
        if not problems:
            a, b = norm_rows(scols, srows), norm_rows(dcols, drows)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if not problems:
            # Pandas-path re-check: fetch the oracle through a DataFrame the
            # way the grading driver does.  HUGEINT/DECIMAL columns silently
            # become float64/object there and hash differently from Spark's
            # int64 even when fetchall() agrees.
            try:
                pdf = con.sql(oracles[name]).df()
                drows_pd = [tuple(r) for r in pdf.itertuples(index=False)]
                b_pd = norm_rows_pd(dcols, drows_pd)
                if a != b_pd:
                    diff = [(x, y) for x, y in zip(a, b_pd) if x != y][:3]
                    problems.append(
                        f"pandas-path values differ (driver hash hazard), "
                        f"first diffs: {diff}"
                    )
            except Exception as e:
                problems.append(f"pandas-path fetch error: {type(e).__name__}: {e}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"ok   {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")
    if len(pair_sets) == 2:
        exact = pair_sets["ngram_jaccard_pairs"]
        lsh = pair_sets["minhash_lsh_pairs"]
        if exact != lsh:
            print(
                "FAIL lsh-pin: minhash_lsh_pairs != ngram_jaccard_pairs "
                f"(only-exact={sorted(exact - lsh)[:5]}, "
                f"only-lsh={sorted(lsh - exact)[:5]}) — four exact-Jaccard "
                "oracles depend on this equality; re-prove before retuning "
                "N_BANDS/ROWS_PER_BAND"
            )
            failures += 1
        else:
            print(f"ok   lsh-pin: LSH pair set == exact pair set ({len(exact)} pairs)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
