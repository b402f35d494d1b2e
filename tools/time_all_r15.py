"""One-pass noop timing of every registered query at sf0.01 — an
outlier finder for the r15 optimization round (NOT bench methodology:
single pass, shared session; use bench.py / profile_r15.py for real
numbers). Streaming file-replay queries are skipped (minutes of
trigger-bound wall time by design).

Usage: python tools/time_all_r15.py [sf_dir] > /tmp/all_times.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SKIP = {
    # file-replay streaming jobs (trigger-bound, minutes — excluded from
    # plan-only linting for the same reason; see tests/test_plans.py)
    "q_streaming_tumbling", "q_session_window", "q_sliding_window",
    "q_streaming_dedup", "q_stream_stream_join", "q_stream_static_join",
    "q_stateful_stream", "q_streaming_upsert", "q_transform_with_state",
    "q_streaming_minhash_dedup", "q_streaming_index_append",
    "q_streaming_pq_encode", "q_streaming_late_drop",
}


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from data_integration_spark.queries import QUERIES, load_all
    from data_integration_spark.session import get_spark

    load_all()
    spark = get_spark(app_name="time_all_r15")
    QUERIES["q_scan_parquet"](spark, sf).write.format("noop").mode(
        "overwrite"
    ).save()
    out: dict[str, float] = {}
    for name in sorted(QUERIES):
        if name in SKIP or "streaming" in name or "stream" in name:
            continue
        t0 = time.perf_counter()
        try:
            QUERIES[name](spark, sf).write.format("noop").mode(
                "overwrite"
            ).save()
            out[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001
            out[name] = -1.0
            print(f"ERR {name}: {e}", file=sys.stderr)
        print(f"{out[name]:8.3f}  {name}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
