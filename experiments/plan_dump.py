#!/usr/bin/env python3
"""Dump .explain("formatted") for headline queries into plans/<tag>/.

Usage: python experiments/plan_dump.py <tag> [query ...]

With no query list, dumps every bench.py HEADLINE query.  Output file:
plans/<tag>/<query>_<suffix>.txt where suffix is $PLAN_SUFFIX (default
"before").  Planning only — nothing is executed, so this is safe to run
alongside other work.
"""
from __future__ import annotations

import contextlib
import io
import os
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from mapreduce_minhash_lsh_spark import registry  # noqa: E402
from mapreduce_minhash_lsh_spark.session import get_spark  # noqa: E402

TAG = sys.argv[1] if len(sys.argv) > 1 else "r14"
NAMES = sys.argv[2:]
SUFFIX = os.environ.get("PLAN_SUFFIX", "before")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import bench

    names = NAMES or bench.HEADLINE
    out_dir = ROOT / "plans" / TAG
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="plan_dump")
    qs = registry.queries()
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # pragma: no cover - diagnostic tool
            plan = f"PLAN CAPTURE FAILED: {exc!r}\n"
        (out_dir / f"{name}_{SUFFIX}.txt").write_text(plan)
        print(f"wrote {name}_{SUFFIX}.txt ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
