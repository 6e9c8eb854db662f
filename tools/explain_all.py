"""Dump explain("formatted") for every catalog query (guide §1/§7.2).

Writes one file per query into the given directory plus a summary TSV
(exchange count, join strategies, python-eval nodes, scan pushdown) the
optimization round's checklist reads from. Lifecycle queries execute
their eager construction work as a side effect — this is the plan of the
RETURNED DataFrame, which for those is the final summary frame.
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_quickstart_iac_spark import plans
from iceberg_quickstart_iac_spark.session import get_spark


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "plans/r14/all"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(
        app_name="explain_all",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.sql.legacy.parquet.nanosAsLong": "true"},
    )
    os.makedirs(out_dir, exist_ok=True)
    rows = []
    for name, fn in plans.queries().items():
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            p = buf.getvalue()
        except Exception as exc:
            p = f"ERROR: {type(exc).__name__}: {exc}"
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as fh:
            fh.write(p)
        rows.append(
            (
                name,
                len(re.findall(r"\bExchange\b", p)),
                len(re.findall(r"SortMergeJoin", p)),
                len(re.findall(r"BroadcastHashJoin", p)),
                len(re.findall(r"ShuffledHashJoin", p)),
                len(re.findall(r"(BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas)", p)),
                len(re.findall(r"Scan parquet|Scan orc", p)),
                len(re.findall(r"Scan ExistingRDD", p)),
            )
        )
        spark.catalog.clearCache()
    with open(os.path.join(out_dir, "_summary.tsv"), "w") as fh:
        fh.write("query\texchanges\tsmj\tbhj\tshj\tpyeval\tfile_scans\trdd_scans\n")
        for r in rows:
            fh.write("\t".join(str(x) for x in r) + "\n")
    print(f"wrote {len(rows)} plans to {out_dir}")


if __name__ == "__main__":
    main()
