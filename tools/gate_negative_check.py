#!/usr/bin/env python3
"""Negative test for the oracle-side gate SQL (NOT part of the library):
proves the {OUT}-substituted gates actually turn red when the Spark
result is wrong, rather than echoing it vacuously.

Copies a completed Verify dump, corrupts four results in four distinct
ways — a perturbed score (score-parity gate), a phantom neighbor
(membership gate), an emptied result (sentinel row), and a halved
top-k (recall-floor gate) — rewrites the oracle SQL to point at the
copy, and asserts oracle_check reports exactly those four FAILs.

Usage: python3 tools/gate_negative_check.py /root/testdata/sf0.01 /tmp/verify_out
(second arg = an existing dump produced by `runMain graft.Verify`).
"""
import glob
import json
import os
import shutil
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq

EXPect_FAIL = ["sim_embed_topk_lsh", "sim_embed_topk_ivf",
               "sim_embed_topk_sq8", "sim_semdedup",
               "q_sketch_rolling_quantiles", "q_sketch_audience_overlap",
               "dedup_incremental_semantic", "stream_semdedup_replay_audit"]


def main(sf_dir, src_dir):
    dst = src_dir.rstrip("/") + "_negative"
    if os.path.exists(dst):
        shutil.rmtree(dst)
    shutil.copytree(src_dir, dst)

    j = json.load(open(os.path.join(dst, "oracle_sql.json")))
    j = {k: v.replace(os.path.abspath(src_dir), os.path.abspath(dst))
         for k, v in j.items()}
    json.dump(j, open(os.path.join(dst, "oracle_sql.json"), "w"))

    def table(name):
        return glob.glob(os.path.join(dst, name, "*.parquet"))[0]

    # 1. score parity: one cosine off by 1e-3
    f = table("sim_embed_topk_lsh")
    t = pq.read_table(f).to_pandas()
    t.loc[0, "cosine"] += 0.001
    pq.write_table(pa.Table.from_pandas(t, preserve_index=False), f)
    # 2. membership: a neighbor id that exists in no exact pair
    f = table("sim_embed_topk_ivf")
    t = pq.read_table(f).to_pandas()
    t.loc[0, "vec_id"] = 999999
    pq.write_table(pa.Table.from_pandas(t, preserve_index=False), f)
    # 3. empty result: the sentinel row must force a row-count mismatch
    f = table("sim_semdedup")
    pq.write_table(pq.read_table(f).slice(0, 0), f)
    # 4. recall floor: drop half the probes (0.5 < every ANN floor)
    f = table("sim_embed_topk_sq8")
    t = pq.read_table(f).to_pandas()
    t = t[t.probe_id < 5]
    pq.write_table(pa.Table.from_pandas(t, preserve_index=False), f)
    # 5. quantile rank envelope: shove one p50 far past its window max
    f = table("q_sketch_rolling_quantiles")
    t = pq.read_table(f).to_pandas()
    t.loc[0, "p50"] = t["p99"].max() * 10 + 1e9
    pq.write_table(pa.Table.from_pandas(t, preserve_index=False), f)
    # 6. set-algebra envelope: inflate one intersection estimate
    f = table("q_sketch_audience_overlap")
    t = pq.read_table(f).to_pandas()
    t.loc[0, "users_both"] = int(t["users_either"].max()) * 10 + 1000
    pq.write_table(pa.Table.from_pandas(t, preserve_index=False), f)
    # 7. partner-split rule: relabel one corpus claim as a batch claim
    #    (its dup_of is a history id, so the batch-partner gate flips)
    f = table("dedup_incremental_semantic")
    t = pq.read_table(f).to_pandas()
    corp = t.index[t["src"] == "corpus"]
    assert len(corp) > 0, "dump has no corpus claims to corrupt"
    t.loc[corp[0], "src"] = "batch"
    pq.write_table(pa.Table.from_pandas(t, preserve_index=False), f)
    # 8. replay-idempotence claim: flip the streamed-vs-sequential
    #    flags verdict — the gate's WHERE must empty the result
    f = table("stream_semdedup_replay_audit")
    t = pq.read_table(f).to_pandas()
    t.loc[0, "flags_match_sequential"] = False
    pq.write_table(pa.Table.from_pandas(t, preserve_index=False), f)

    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "oracle_check.py"),
         sf_dir, dst],
        capture_output=True, text=True).stdout
    failed = sorted(l.split()[1].rstrip(":") for l in out.splitlines()
                    if l.startswith("FAIL"))
    want = sorted(EXPect_FAIL)
    if failed == want:
        print(f"NEGATIVE-TEST PASS: exactly {want} went red")
        return 0
    print(f"NEGATIVE-TEST FAIL: expected {want}, got {failed}\n{out}")
    return 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
