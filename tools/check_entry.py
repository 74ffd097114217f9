"""Local twin of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() twin on DuckDB at the given sf, compare
row count, column names, and order-insensitive normalized values.

Usage: python tools/check_entry.py [sf_dir] [query ...] [--extra]
       [--only-extra] [--json OUT.json]

--json writes the per-query results as a JSON artifact (the per-round
certification record for the extras registry, VERDICT r3 missing #1).
--only-extra restricts the run to the extra_queries() overflow registry.
"""

from __future__ import annotations

import decimal
import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from repurpose_spark.session import get_spark  # noqa: E402
from repurpose_spark.sources.testdata import TABLES  # noqa: E402


def _norm(v):
    if v is None:
        return None
    if isinstance(v, decimal.Decimal):
        # type-tagged: the driver's value hash is type-sensitive, so a
        # Decimal on one side vs a float on the other must FAIL here too
        return f"decimal:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return str(v)


def _rows_to_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # None-safe total order (e.g. outer-join/grouping-set NULLs)
    def key(t):
        return tuple((v is None, v) for v in t)
    out = sorted((tuple(_norm(r[i]) for i in order) for r in rows), key=key)
    return out


def main():
    import json

    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        # require a non-flag value: '--json' last or '--json --extra'
        # would otherwise IndexError / silently eat the next flag
        if i + 1 >= len(argv) or argv[i + 1].startswith("--"):
            sys.exit("usage: --json OUT.json (a non-flag path must follow)")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    flags = {a for a in argv if a.startswith("--")}
    args = [a for a in argv if not a.startswith("--")]
    with_extra = "--extra" in flags or "--only-extra" in flags
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    spark = get_spark(master="local[8]", app_name="check_entry")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql(sf_dir)
    if with_extra or (only and not only <= set(qs)):
        # the driver-window overflow registry (subsumed queries) is still
        # locally checkable: --extra, or naming one of them explicitly
        if "--only-extra" in flags:
            qs = entrymod.extra_queries()
        else:
            qs = {**qs, **entrymod.extra_queries()}
        oracles = {**oracles, **entrymod.extra_oracle_sql()}
    n_pass = n_fail = 0
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            results[name] = {"status": "fail", "detail": f"spark error {type(e).__name__}"}
            n_fail += 1
            continue
        if name not in oracles:
            spec = getattr(entrymod, "error_bound_oracles", dict)().get(name)
            if spec is None:
                print(f"ROWS-ONLY {name}: {len(srows)} rows")
                results[name] = {"status": "rows-only", "rows": len(srows)}
                continue
            # error-bound value oracle (VERDICT r4 #2): exact columns must
            # match byte-for-byte; the estimate column must sit within
            # rel_err of DuckDB's exact answer — or, in bracket mode
            # (rank-error sketches, where value-relative bounds are the
            # wrong shape on heavy tails), between DuckDB's exact lower
            # and upper bracket values — row by row
            est, rel = spec["est_col"], spec.get("rel_err")
            bracket = spec.get("bracket")
            try:
                res = con.sql(spec["sql"])
                dcols = res.columns
                drows = res.fetchall()
            except Exception as e:
                print(f"FAIL {name}: duckdb error {e}")
                results[name] = {"status": "fail", "detail": "duckdb error"}
                n_fail += 1
                continue
            want_dcols = (
                sorted(set(scols) - {est} | set(bracket.values()))
                if bracket else sorted(scols)
            )
            if sorted(dcols) != want_dcols or len(srows) != len(drows):
                print(
                    f"FAIL {name}: shape {sorted(scols)}x{len(srows)} "
                    f"vs {sorted(dcols)}x{len(drows)}"
                )
                results[name] = {"status": "fail", "detail": "shape mismatch"}
                n_fail += 1
                continue
            exact_cols = sorted(c for c in scols if c != est)

            def _aligned(cols, rows, get):
                return sorted(
                    (
                        tuple(_norm(get(r, c)) for c in exact_cols),
                        float(get(r, est)),
                    )
                    for r in rows
                )

            a = _aligned(scols, srows, lambda r, c: r[c])
            didx = {c: i for i, c in enumerate(dcols)}
            if bracket:
                lo_c, hi_c = bracket["lo_col"], bracket["hi_col"]

                def _f(v):
                    # a NULL bracket value (e.g. all-NULL group) must
                    # fail THAT row, not crash the whole checker run
                    return float("nan") if v is None else float(v)

                b = sorted(
                    (
                        tuple(_norm(r[didx[c]]) for c in exact_cols),
                        (_f(r[didx[lo_c]]), _f(r[didx[hi_c]])),
                    )
                    for r in drows
                )
                tol = 1e-9
                bad = [
                    (ka, ea, lohi)
                    for (ka, ea), (kb, lohi) in zip(a, b)
                    if ka != kb
                    or not (
                        lohi[0] - tol - abs(lohi[0]) * tol <= ea
                        <= lohi[1] + tol + abs(lohi[1]) * tol
                    )
                ]
                if bad:
                    print(f"FAIL {name}: bracket miss, first: {bad[:3]}")
                    results[name] = {"status": "fail", "detail": "bracket"}
                    n_fail += 1
                    continue
                print(
                    f"PASS {name}: {len(srows)} rows "
                    f"[bracket {lo_c}..{hi_c}]"
                )
                results[name] = {
                    "status": "pass", "rows": len(srows),
                    "checks": [
                        "rowcount", "columns",
                        f"values({lo_c}<=est<={hi_c})",
                    ],
                }
                n_pass += 1
                continue
            b = _aligned(dcols, drows, lambda r, c: r[didx[c]])
            bad = [
                (ka, ea, eb_)
                for (ka, ea), (kb, eb_) in zip(a, b)
                if ka != kb or abs(ea - eb_) > rel * eb_ + 1
            ]
            if bad:
                print(f"FAIL {name}: error-bound mismatch, first: {bad[:3]}")
                results[name] = {"status": "fail", "detail": "error-bound"}
                n_fail += 1
                continue
            worst = max(
                (abs(ea - eb_) / eb_ if eb_ else 0.0)
                for (_, ea), (_, eb_) in zip(a, b)
            ) if a else 0.0
            print(
                f"PASS {name}: {len(srows)} rows "
                f"[error-bound ≤{rel}, worst {worst:.4f}]"
            )
            results[name] = {
                "status": "pass", "rows": len(srows),
                "checks": ["rowcount", "columns", f"values(|err|<={rel})"],
                "worst_rel_err": round(worst, 6),
            }
            n_pass += 1
            continue
        try:
            res = con.sql(oracles[name])
            dcols = res.columns
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e}")
            results[name] = {"status": "fail", "detail": "duckdb error"}
            n_fail += 1
            continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns {sorted(scols)} vs {sorted(dcols)}")
            results[name] = {"status": "fail", "detail": "column mismatch"}
            n_fail += 1
            continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount {len(srows)} vs {len(drows)}")
            results[name] = {"status": "fail", "detail": f"rowcount {len(srows)} vs {len(drows)}"}
            n_fail += 1
            continue
        a = _rows_to_set(scols, [[r[c] for c in scols] for r in srows])
        b = _rows_to_set(dcols, drows)
        if a != b:
            bad = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            results[name] = {"status": "fail", "detail": "value mismatch"}
            n_fail += 1
            continue
        # driver-hash risk audit: the driver's value hash is encoding
        # sensitive — DECIMAL/HUGEINT on either side tends to hash-mismatch
        # even when fetchall() values compare equal (HUGEINT → plain int).
        risky = [
            f"duckdb:{c}={t}"
            for c, t in zip(dcols, [str(t) for t in res.types])
            if "DECIMAL" in str(t).upper() or "HUGEINT" in str(t).upper()
        ] + [
            f"spark:{f.name}={f.dataType.simpleString()}"
            for f in sdf.schema.fields
            if f.dataType.simpleString().startswith("decimal")
        ]
        flag = f"  [TYPE-RISK {risky}]" if risky else ""
        print(f"PASS {name}: {len(srows)} rows{flag}")
        results[name] = {
            "status": "pass", "rows": len(srows),
            "checks": ["rowcount", "columns", "values"],
        }
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_pass": n_pass,
                    "n_fail": n_fail,
                    "queries": results,
                },
                f, indent=1,
            )
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
