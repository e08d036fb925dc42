"""Medallion pipeline scale ladder (r8 verdict ask #7): run the full
bronze→silver→gold pipeline at 1x / 10x / 100x the reference's own
fixture scale (2 500 employees / 150 products / 5 000 sales —
data_generator.py:19-21) and show layer materialization stays
data-proportional. Fixture generation is outside the timed span; each
scale times ONE cold run plus one warm re-run of the 9-statement
pipeline (3 CSV loads + 3 silver + 3 gold writes, all overwrite-
idempotent).

    python tools/medallion_ladder.py [--scales 1,10,100]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = {"n_employees": 2500, "n_products": 150, "n_sales": 5000}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,10,100")
    args = ap.parse_args()

    from etl_project_gcp_spark import datagen
    from etl_project_gcp_spark.plans.medallion import MedallionPipeline
    from etl_project_gcp_spark.session import get_spark

    spark = get_spark(app_name="medallion-ladder")
    print("| scale | employees | products | sales | cold (s) | warm (s) |")
    print("|---|---|---|---|---|---|")
    for scale in [int(s) for s in args.scales.split(",")]:
        sizes = {k: v * scale for k, v in BASE.items()}
        # products grow sub-linearly like a real dim (sqrt-ish cap):
        # a 100x sales table does not come with 100x distinct products
        sizes["n_products"] = min(sizes["n_products"], 5000)
        root = tempfile.mkdtemp(prefix=f"medallion_ladder_{scale}x_")
        try:
            sources = datagen.write_fixture_csvs(
                spark, f"{root}/landing", **sizes
            )
            pipe = MedallionPipeline(spark, f"{root}/warehouse")
            walls = []
            for _ in range(2):
                t0 = time.time()
                result = pipe.run_etl(sources)
                walls.append(time.time() - t0)
                if not result.get("success"):
                    raise SystemExit(f"pipeline failed at {scale}x: {result}")
            print(
                f"| {scale}x | {sizes['n_employees']:,} | "
                f"{sizes['n_products']:,} | {sizes['n_sales']:,} | "
                f"{walls[0]:.1f} | {walls[1]:.1f} |"
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
