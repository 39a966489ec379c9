#!/usr/bin/env python3
"""Merge N full graft.Bench records (target/bench.json format) into one by
per-query MIN — the same min-of-honest-measurements estimator the bench's
own outlier retry applies within a run, extended across independent runs.
Box contention during any single run (this container shares its host with
other JVMs during driver rounds; measured 2-3x swings on heavy sf1
entries between back-to-back runs) then cannot inflate the committed
record, while a real regression — slow in EVERY run — still shows.

The merged record keeps full provenance: each input's total and
retry count under "merged_from"; "value" is the sum of the per-query
mins. sf1_smoke maps are min-merged the same way when present.

Re-base floors (VERDICT r12 #2): a record re-based with provenance (a
SoloTimes warm-solo adjudication, recorded in the input's "floors" map)
must NOT be pulled back down by a later run's one-off fast observation —
that is the exact bimodal-min mechanism the re-base corrected, and the
unconditional min-merge quietly undid two of round 12's own re-bases
(asof 0.280 -> 0.176, embed_pool 0.255 -> 0.227). Floors from every
input are unioned (max on conflict) and clamp the merged per-query mins;
lowering a floored record is a deliberate act (re-run SoloTimes, edit
the floor with provenance in "note"), never a merge side effect.

Usage: tools/bench_min.py out.json in1.json in2.json [...]
"""
import json
import sys

out, ins = sys.argv[1], sys.argv[2:]
recs = [json.load(open(p)) for p in ins]

# Min-merging only makes sense over runs of the SAME scale fixture, and the
# final totals line formats every input's "value" — check both up front so a
# mixed-sf or partial record fails loudly instead of committing a mislabeled
# merge.
for p, r in zip(ins, recs):
    assert isinstance(r.get("sf"), str), f"{p}: missing 'sf' — record predates the sf field?"
    assert isinstance(r.get("value"), (int, float)), f"{p}: non-numeric 'value'"
sfs = {r["sf"] for r in recs}
assert len(sfs) == 1, f"refusing to merge records from different sf dirs: {sorted(sfs)}"

# Bench's own "value" is the sf-dir-only sum (its comment: round-over-round
# comparability), but its "queries" map also carries the fixed-sf0.01
# ExactSubstr stride-1 entry — keep that entry in the merged map, exclude
# it from the merged total so merged-vs-direct totals stay comparable.
FIXED_SF_ENTRIES = {"q_dedup_substring_spans_stride1_sf001"}

queries = {}
for r in recs:
    for q, t in r["queries"].items():
        if t is None or t < 0:
            continue
        queries[q] = t if q not in queries else min(queries[q], t)

# re-base floors: union across inputs (max wins — the latest re-base is
# never lower than a stale one it supersedes), then clamp the merged mins
floors = {}
for r in recs:
    for q, v in (r.get("floors") or {}).items():
        floors[q] = v if q not in floors else max(floors[q], v)
clamped = sorted(q for q, v in floors.items() if q in queries and queries[q] < v)
for q in clamped:
    queries[q] = floors[q]
if clamped:
    print(f"floors held for {len(clamped)} re-based record(s): {', '.join(clamped)}")

smoke = {}
for r in recs:
    for q, t in (r.get("sf1_smoke") or {}).items():
        if t is None or t < 0:
            continue
        smoke[q] = t if q not in smoke else min(smoke[q], t)

# a query that failed in one run but has a valid time from another is a
# recovered measurement, not a merged failure
errors = sorted({e for r in recs for e in r.get("errors", [])} - set(queries))
merged = {
    "metric": "total",
    "value": sum(t for q, t in queries.items() if q not in FIXED_SF_ENTRIES),
    "unit": "sec",
    "queries": queries,
    "errors": errors,
    "sf1_smoke": smoke,
    "sf": recs[0].get("sf"),
    "merged_from": [
        {"total": r.get("value"), "retries": len(r.get("retried", []))}
        for r in recs
    ],
    "runs": len(recs),
}
if floors:
    merged["floors"] = floors
notes = [r["note"] for r in recs if r.get("note")]
if notes:
    merged["note"] = " | ".join(notes)
with open(out, "w") as f:
    json.dump(merged, f)
print(f"{out}: {len(queries)} queries, total {merged['value']:.1f}s "
      f"from {len(recs)} runs (totals: "
      + ", ".join(f"{r.get('value'):.1f}" for r in recs) + ")")
