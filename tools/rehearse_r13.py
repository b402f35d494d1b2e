"""r13 sf10 / 100× rehearsals — reproduces the SCALING.md r13 rows.

Two targets (VERDICT r12 #6 and #7):

- ``survey``: the reference's flagship statistical path END-TO-END —
  GLM baseline → EM (adjusted ML) → EBP draws → direct estimates →
  bootstrap MSPE (B=2, the VERDICT-sanctioned rehearsal config) → final
  report — on fixtures scaled 100× per-state (big survey ~45k units per
  state ≈ 2.3M rows, small survey ~5.5k per state ≈ 280k rows) next to
  the standard fixture size. SCALING.md already certifies the EM and
  bootstrap KERNELS at 100×; this row certifies their composition (the
  lineage: one fit feeds draws, scoring, and B bootstrap refits).

- ``nbq``: the staged bootstrapped-NB quality filter at sf0.1 vs the
  sf10 (100×) rehearsal corpus — label + explode are row-local, the
  token contingency and scoring are map-side-combined groupBys plus one
  token-keyed equi-join, so the expected curve is near-linear in corpus
  tokens.

Usage: python tools/rehearse_r13.py [survey|nbq ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF10 = "/root/repo/.scratch/sf10"
FIX100 = "/root/repo/.scratch/survey_fixtures_100x"


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _fixture_frames(spark, base, scale):
    """Write (once) and read the survey fixtures at ``scale``× the
    standard per-state unit counts; same generator, same seed."""
    from data_integration_spark.stats.fixtures import make_fixtures

    if not os.path.exists(os.path.join(base, "survey_small.parquet")):
        fx = make_fixtures(
            small_per_state=(20 * scale, 90 * scale),
            big_per_state=(200 * scale, 700 * scale),
        )
        os.makedirs(base, exist_ok=True)
        for name in ("survey_small", "survey_big", "actual_result"):
            spark.createDataFrame(fx[name]).write.mode("overwrite").parquet(
                os.path.join(base, f"{name}.parquet")
            )
    return tuple(
        spark.read.parquet(os.path.join(base, f"{n}.parquet"))
        for n in ("survey_small", "survey_big", "actual_result")
    )


def rehearse_survey(spark):
    """q_survey_pipeline's exact config (EM 200 reps / EBP 100 draws /
    B=2 bootstrap with the reduced-budget EM) at 1× and 100× fixtures.
    Timed from cold pipeline start to a fully materialized report (the
    report is 51 rows — materialization IS the compute)."""
    from data_integration_spark.stats.em import EMEstimator
    from data_integration_spark.stats.pipeline import run_pipeline

    warmed = False
    for scale, base, tag in (
        (1, "/root/repo/.scratch/survey_fixtures_r13_1x", "1x"),
        (100, FIX100, "100x"),
    ):
        small, big, actuals = _fixture_frames(spark, base, scale)
        if not warmed:
            # one untimed 1× pass: the first pipeline run pays JVM/codegen
            # warmup that would otherwise make 1× read SLOWER than 100×
            run_pipeline(
                spark, small, big, actuals,
                em=EMEstimator(n_reps=200, tol=0.02, max_iter=40, seed=42),
                ebp_draws=100, bootstrap_reps=2,
                bootstrap_em=EMEstimator(
                    n_reps=80, tol=0.05, max_iter=10, seed=43
                ),
            ).report.count()
            warmed = True
        t0 = time.perf_counter()
        res = run_pipeline(
            spark,
            small,
            big,
            actuals,
            em=EMEstimator(n_reps=200, tol=0.02, max_iter=40, seed=42),
            ebp_draws=100,
            bootstrap_reps=2,
            bootstrap_em=EMEstimator(n_reps=80, tol=0.05, max_iter=10, seed=43),
        )
        rows = res.report.count()
        print(
            json.dumps(
                {
                    "op": "q_survey_pipeline (end-to-end)",
                    "tag": tag,
                    "sec": round(time.perf_counter() - t0, 2),
                    "report_rows": rows,
                    "small_rows": small.count(),
                    "big_rows": big.count(),
                }
            ),
            flush=True,
        )


def rehearse_nbq(spark):
    from data_integration_spark.queries import PENDING_R10, load_all

    load_all()
    for name in ("q_quality_nb_filter", "q_crossmodal_dedup"):
        fn, _o = PENDING_R10[name]
        for sf, tag in ((SF01, "sf0.1"), (SF10, "sf10")):
            _noop(fn(spark, sf))  # warm
            t0 = time.perf_counter()
            _noop(fn(spark, sf))
            print(
                json.dumps(
                    {
                        "op": name,
                        "tag": tag,
                        "sec": round(time.perf_counter() - t0, 2),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    from data_integration_spark.session import get_spark

    which = set(sys.argv[1:]) or {"survey", "nbq"}
    spark = get_spark(app_name="rehearse-r13")
    if "survey" in which:
        rehearse_survey(spark)
    if "nbq" in which:
        rehearse_nbq(spark)
    spark.stop()
