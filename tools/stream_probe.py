"""Instrument a streaming catalog entry's drain: run it once and dump the
per-micro-batch StreamingQueryProgress durationMs breakdown (triggerExecution,
queryPlanning, walCommit, commitOffsets, addBatch, getBatch, latestOffset)
for every streaming query that ran in the session.

Usage: python tools/stream_probe.py x15_stream_outer_interval_join [--sf DIR]

This tells WHERE drain wall-clock goes (state commit vs offset log vs actual
batch work) before touching any drain code — guide §1 (measure first).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from finporter_spark.queries.catalog import catalog_queries
from finporter_spark.session import get_session


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_session("stream-probe")
    qs = catalog_queries()

    # collect progress events for every stream via a listener
    from pyspark.sql.streaming import StreamingQueryListener

    events: list[dict] = []

    class L(StreamingQueryListener):
        def onQueryStarted(self, e):
            events.append({"kind": "start", "name": e.name, "t": time.time()})

        def onQueryProgress(self, e):
            p = e.progress
            events.append(
                {
                    "kind": "progress",
                    "name": p.name,
                    "batchId": p.batchId,
                    "numInputRows": p.numInputRows,
                    "durationMs": dict(p.durationMs),
                    "stateOperators": [
                        {
                            "operatorName": s.operatorName,
                            "commitTimeMs": s.commitTimeMs,
                            "numRowsTotal": s.numRowsTotal,
                        }
                        for s in p.stateOperators
                    ],
                }
            )

        def onQueryIdle(self, e):
            pass

        def onQueryTerminated(self, e):
            events.append({"kind": "end", "t": time.time()})

    spark.streams.addListener(L())

    for name in args.queries:
        events.clear()
        t0 = time.time()
        qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        # listener events arrive async; give them a beat
        time.sleep(1.0)
        print(f"\n=== {name}: wall {wall:.2f}s ===")
        tot_trigger = 0.0
        for ev in list(events):
            if ev["kind"] != "progress":
                continue
            d = ev["durationMs"]
            tot_trigger += d.get("triggerExecution", 0) / 1000.0
            print(
                f"  batch {ev['batchId']:>2} rows={ev['numInputRows']:>8} "
                + json.dumps(d)
            )
            for s in ev["stateOperators"]:
                print(
                    f"        state {s['operatorName']}: "
                    f"commit={s['commitTimeMs']}ms total={s['numRowsTotal']}"
                )
        print(f"  sum(triggerExecution) = {tot_trigger:.2f}s of {wall:.2f}s wall")


if __name__ == "__main__":
    main()
