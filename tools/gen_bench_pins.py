#!/usr/bin/env python3
"""Regenerate src/main/scala/graft/BenchPins.scala from a stamped
BENCH_LOCAL_r{N}.json (the `queries` min map). Usage:

    python3 tools/gen_bench_pins.py BENCH_LOCAL_r17.json [drop_query ...]

Queries passed as extra args are EXCLUDED from the pin table — use
this for queries whose plan the current round restructures (their old
min is a stale pin; Bench then runs them full min-of-2 until the next
stamp). Dev tooling only (system python3), never a library dependency.
"""
import json
import re
import sys

def main() -> None:
    stamp = sys.argv[1]
    drop = set(sys.argv[2:])
    src_name = re.sub(r"\.json$", "", stamp.split("/")[-1])
    q = json.load(open(stamp))["queries"]
    items = sorted((k, v) for k, v in q.items() if k not in drop)
    lines = ['    "%s" -> %.3f,' % (k, v) for k, v in items]
    lines[-1] = lines[-1].rstrip(",")
    body = "\n".join(lines)
    src = f'''package graft

/** Per-query pinned bench history: the stamped min-of-2 seconds from
  * {src_name}.json (sf0.1, 32 cpus, quiet box), consumed by
  * [[Bench]]'s conditional second pass (r16 verdict item 1a). A query
  * whose first pass lands within the stamped skip rule of its pin is
  * STABLE — its steady-state cost is already on record and a second
  * pass spends driver-timeout margin to reconfirm it; pass 2 runs
  * only for queries with no pin (new), a stale pin (restructured —
  * removed from this table on change), or a pass-1 reading that
  * disagrees with history (regression or load spike — min-of-2 plus
  * the budgeted third pass keeps those honest). Pins are keyed to
  * sf0.1: Bench ignores this table at any other SF.
  *
  * REGENERATION RULE: when a round restructures a query's plan,
  * delete its entry here (or exclude it from the merged pin source);
  * when a new stamp lands, regenerate the whole table from its
  * `queries` map (tools/gen_bench_pins.py). r17's source is
  * BENCH_PINS_r17.json — the per-query MIN over the r16 stamp
  * (plan-unchanged queries only) and the three r17 full-board runs,
  * so pins stay the best-known steady state rather than inheriting
  * a contended run's inflation (see the json's `note`).
  */
object BenchPins {{
  /** stamped round the pins came from (emitted in-band in the JSON) */
  val Source = "{src_name}"

  val Mins: Map[String, Double] = Map(
{body}
  )
}}
'''
    path = "src/main/scala/graft/BenchPins.scala"
    open(path, "w").write(src)
    print(f"wrote {len(items)} pins from {src_name} -> {path}")

if __name__ == "__main__":
    main()
