"""Scale rehearsal: run the pinned comparator subsets at sf1.0 — 10×
the bench data — and record the wall-vs-sf curve (VERDICT r11 #1).

Every 100 TB claim in SURVEY rests on component stress tools plus
sf0.1 suite numbers; the one whole-suite data-scaling measurement
predates the table layer, the indexes, DV, streams, and the change
log. This tool closes that gap:

  python tools/scale_rehearsal.py build    # synthesize .scale/sf1
  python tools/scale_rehearsal.py run      # bench subsets @ sf0.1 + sf1
  python tools/scale_rehearsal.py report   # slope table from artifact

``build`` scales /root/testdata/sf0.1 by 10× IN PYARROW (no Spark):
key-remapped replicas with consistent foreign keys, so joins hit 10×
the rows with the same selectivities. The fixed dimensions
(region/nation) stay fixed, TPC-H style. Two tables are perturbed so
scale-up does not fabricate degenerate structure the real generator
would never produce:

- ``documents``: replica texts get a per-(replica, doc) seeded word
  shuffle — 10 verbatim copies of every doc would hand the near-dup
  queries quadratic bucket blowups that say nothing about scaling;
- ``embeddings``: seeded Gaussian noise (σ=0.05) per replica — exact
  vector copies would do the same to the cosine near-dup path.

``events`` is rewritten with its ORIGINAL arrow schema (timestamp
NANOS) — the engine's readers handle the ns logical type at runtime
and the rehearsal must exercise that same path.

``run`` shells out to bench.py twice with SPARK_GRAFT_SUBSET=pinned
(the two frozen comparator subsets + every commit: fixture row — the
flagship multi-commit scenarios) and SPARK_GRAFT_FULL_OUT pointing at
throwaway sidecars, then writes SCALE_REHEARSAL.json: per-query walls
at both scales, per-family slope medians, and a compact block that
bench.py embeds into the round's headline BENCH line. Run it on a
QUIET rig (the calibration rows embedded in each side record the rig
state either way).
"""

from __future__ import annotations

import json
import os
import random
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"
DST = os.path.join(REPO, ".scale", "sf1")
REPLICAS = 10
ARTIFACT = os.path.join(REPO, "SCALE_REHEARSAL.json")

#: key columns offset per replica: table -> {column: stride-source}
#: stride = (max(key) + 1) of the SOURCE table so replicas never
#: collide and every FK remaps to the SAME replica's parent rows
_KEYED = {
    "customer": {"c_custkey": "customer.c_custkey"},
    "supplier": {"s_suppkey": "supplier.s_suppkey"},
    "part": {"p_partkey": "part.p_partkey"},
    "orders": {
        "o_orderkey": "orders.o_orderkey",
        "o_custkey": "customer.c_custkey",
    },
    "lineitem": {
        "l_orderkey": "orders.o_orderkey",
        "l_partkey": "part.p_partkey",
        "l_suppkey": "supplier.s_suppkey",
    },
    "events": {
        "event_id": "events.event_id",
        "user_id": "events.user_id",
    },
    "documents": {"doc_id": "documents.doc_id"},
    "embeddings": {"vec_id": "embeddings.vec_id"},
}
_COPY = ("region", "nation")


def _strides() -> dict[str, int]:
    out: dict[str, int] = {}
    for refs in _KEYED.values():
        for ref in refs.values():
            if ref in out:
                continue
            tbl, col = ref.split(".")
            t = pq.read_table(
                os.path.join(SRC, f"{tbl}.parquet"), columns=[col]
            )
            out[ref] = int(pc.max(t.column(col)).as_py()) + 1
    return out


def _shuffle_docs(tab: pa.Table, rep: int, vocab: list[str]) -> pa.Table:
    """Per-(replica, doc) seeded rewrite: shuffle the words AND
    replace ~45% of them with seeded draws from the global vocab.

    The first rehearsal run used shuffle alone — which preserves the
    word MULTISET, so every word-set similarity measure saw each doc
    with 10 EXACT copies (replica-pair Jaccard = 1.0, measured) and
    the near-dup rows paid a fabricated quadratic pair blowup (32× at
    10× data) a real generator would never produce. Replacement drops
    replica-pair word Jaccard to ~0.3, below every configured
    threshold, while keeping vocab, lengths, and per-doc word-count
    distributions (lang-ID/quality/token stats unaffected in
    character). n_chars recomputes from the new text."""
    texts = tab.column("text").to_pylist()
    ids = tab.column("doc_id").to_pylist()
    out = []
    for did, txt in zip(ids, texts):
        if txt is None:
            out.append(None)
            continue
        rng = random.Random((rep << 32) ^ (did or 0))
        words = txt.split(" ")
        rng.shuffle(words)
        words = [
            (vocab[rng.randrange(len(vocab))] if rng.random() < 0.45
             else w)
            for w in words
        ]
        out.append(" ".join(words))
    i = tab.schema.get_field_index("text")
    tab = tab.set_column(
        i, tab.schema.field(i), pa.array(out, pa.string())
    )
    j = tab.schema.get_field_index("n_chars")
    n = pa.array(
        [len(t) if t is not None else None for t in out],
        tab.schema.field(j).type,
    )
    return tab.set_column(j, tab.schema.field(j), n)


def _perturb_embeddings(tab: pa.Table, rep: int) -> pa.Table:
    """Seeded Gaussian noise per replica, sized to DECORRELATE
    replicas: the vectors are unit-norm dim-64, and per-component
    σ = 1/√d puts replica-pair cosine at ≈ 1/√2 ≈ 0.71 — well below
    the near-dup thresholds, so scale-up doesn't fabricate 10-way
    duplicate clusters (σ = 0.05 in the first rehearsal run left
    replica cosine at 0.93, inside threshold, and the cosine near-dup
    row paid a fabricated 23× blowup). kNN top-k rows are unaffected
    in character — neighbors remain plentiful, just not degenerate."""
    col = tab.column("embedding").combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        col = col.chunk(0)
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.float32)
    d = 64 if len(flat) == 0 else (len(flat) // max(tab.num_rows, 1))
    rng = np.random.default_rng(4242 + rep)
    flat = flat + rng.normal(0.0, 1.0 / max(d, 1) ** 0.5,
                             flat.shape).astype(np.float32)
    new = pa.ListArray.from_arrays(col.offsets, pa.array(flat, pa.float32()))
    i = tab.schema.get_field_index("embedding")
    return tab.set_column(i, tab.schema.field(i), new.cast(tab.schema.field(i).type))


def build() -> None:
    os.makedirs(DST, exist_ok=True)
    strides = _strides()
    for name in _COPY:
        src = os.path.join(SRC, f"{name}.parquet")
        t = pq.read_table(src)
        pq.write_table(t, os.path.join(DST, f"{name}.parquet"),
                       version="2.6")
        print(f"{name}: copied {t.num_rows} rows")
    for name, keys in _KEYED.items():
        src = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        vocab: list[str] = []
        if name == "documents":
            vocab = sorted({
                w
                for t in src.column("text").to_pylist()
                if t
                for w in t.split(" ")
            })
        reps = []
        for r in range(REPLICAS):
            t = src
            for col, ref in keys.items():
                i = t.schema.get_field_index(col)
                shifted = pc.add(
                    t.column(col), pa.scalar(r * strides[ref],
                                             type=t.schema.field(i).type)
                )
                t = t.set_column(i, t.schema.field(i), shifted)
            if name == "documents" and r > 0:
                t = _shuffle_docs(t, r, vocab)
            if name == "embeddings" and r > 0:
                t = _perturb_embeddings(t, r)
            reps.append(t)
        out = pa.concat_tables(reps)
        pq.write_table(
            out, os.path.join(DST, f"{name}.parquet"), version="2.6"
        )
        # the engine's readers must see the SAME logical types the
        # driver's files carry (events: timestamp NANOS)
        got = pq.read_schema(os.path.join(DST, f"{name}.parquet"))
        want = pq.read_schema(os.path.join(SRC, f"{name}.parquet"))
        for f in want:
            assert got.field(f.name).type == f.type, (
                name, f.name, f.type, got.field(f.name).type
            )
        print(f"{name}: {src.num_rows} -> {out.num_rows} rows")


def _bench(sf_dir: str, out_name: str, subset: str = "pinned") -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_SUBSET"] = subset
    env["SPARK_GRAFT_FULL_OUT"] = out_name
    print(f"== bench {subset} @ {sf_dir} -> {out_name}", flush=True)
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, cwd=REPO, capture_output=True, text=True,
        timeout=7200,
    )
    sys.stderr.write(p.stderr[-4000:])
    if p.returncode != 0:
        print(f"bench rc={p.returncode}")
    with open(os.path.join(REPO, out_name)) as f:
        return json.load(f)


_FAMILIES = {
    "scan/agg/join": (
        "count_rows", "fact_join_agg", "dim_broadcast_join",
        "filter_project_rewrite", "lineitem_pricing_summary",
        "rollup_returnflag", "scan_limit_sorted", "distinct_pairs",
        "topk_orders_per_segment", "union_tagged_batches",
        "semi_join_touched_keys", "anti_join_new_keys",
        "window_latest_event", "events_value_stats",
    ),
    "table engine (upsert/commits)": (
        "upsert_arrival_wins", "upsert_event_time_wins",
        "upsert_then_delete", "merge_into_scenario",
        "time_travel_first_commit", "incremental_read_since_first",
        "hive_partition_paths", "merge_into_disjoint_rebase",
        "manifest_relation_read", "dual_path_read_agreement",
        "commit:upsert_day0_bulk", "commit:upsert_day1_upsert",
        "commit:upsert_day2_late", "commit:two_batch_scenario_build",
    ),
    "DV / CDF / chlog": (
        "dv_delete_read", "dv_upsert_scenario", "dv_predicate_dml",
        "dv_maintenance_fold", "dv_external_engine_read",
        "change_feed_clicks", "stream_cdf_agg_maintenance",
        "commit:cdf_scenario_build", "commit:cdfexact_src_build",
        "commit:cdfchanges_src_build", "commit:cdfchlog_src_build",
        "commit:tblchanges_src_build", "commit:dml_scenario_build",
    ),
    "indexes / lookups": (
        "knn_ivf_indexed", "knn_lsh_indexed", "keyword_search_indexed",
        "ann_index_maintained_upsert", "ann_recall_audit",
        "range_read_time_slice", "commit:rli_scenario_build",
        "commit:lookup_join_scenario_build", "commit:pruned_table_build",
    ),
    "dedup / similarity": (
        "exact_dedup", "minhash_near_dup", "simhash_near_dup",
        "embedding_near_dup", "jaccard_dedup_survivors",
        "near_dup_components", "dedup_chain_fixpoint",
        "word_jaccard_pairs", "knn_bruteforce", "knn_l2_bruteforce",
        "knn_ivf", "knn_lsh", "segment_dedup_reassembled",
        "incremental_near_dup_vs_index", "incremental_dedup_vs_corpus",
        "benchmark_decontamination", "decontaminated_corpus",
        "doc_winnowing_fingerprints", "commit:mh_index_build",
    ),
    "text / multimodal": (
        "text_stats_per_doc", "docs_quality_by_source",
        "lang_id_accuracy", "media_meta_extract", "video_frame_sample",
        "embedding_quantize_int8", "tf_idf_top_terms",
        "kmeans_embedding_clusters", "train_val_test_split",
    ),
    "streaming": (
        "stream_keyed_ingest", "stream_tumbling_counts",
        "stream_running_totals", "stream_session_windows",
        "stream_dedup_exact", "stream_dim_join_windowed",
        "stream_stream_interval_join", "stream_text_pipeline",
        "curation_pipeline_end_to_end",
    ),
}


def _slopes(q01: dict, q1: dict) -> dict:
    import statistics

    fams = {}
    for fam, names in _FAMILIES.items():
        ratios = [
            q1[n] / q01[n]
            for n in names
            if n in q01 and n in q1 and q01[n] > 0.05
        ]
        if ratios:
            fams[fam] = {
                "n": len(ratios),
                "median_ratio_10x_data": round(statistics.median(ratios), 2),
                "max_ratio": round(max(ratios), 2),
                "max_query": max(
                    (n for n in names if n in q01 and n in q1
                     and q01[n] > 0.05),
                    key=lambda n: q1[n] / q01[n],
                ),
            }
    return fams


def run() -> None:
    if not os.path.isdir(DST):
        build()
    b01 = _bench(SRC, "BENCH_SCALE_sf01.json")
    b1 = _bench(DST, "BENCH_SCALE_sf1.json")
    q01, q1 = b01["queries"], b1["queries"]
    both = sorted(set(q01) & set(q1))
    fams = _slopes(q01, q1)
    sub01 = b01.get("pinned_subset", {})
    sub1 = b1.get("pinned_subset", {})
    ext01 = b01.get("pinned_ext", {})
    ext1 = b1.get("pinned_ext", {})
    compact = {
        "sf_ratio": 10,
        "pinned_sq_sf01": sub01.get("sec_per_query"),
        "pinned_sq_sf1": sub1.get("sec_per_query"),
        "pinned_wall_ratio": round(
            sub1.get("wall_seconds", 0) / max(sub01.get("wall_seconds", 1), 1e-9), 2
        ),
        "pinned_ext_sq_sf01": ext01.get("sec_per_query"),
        "pinned_ext_sq_sf1": ext1.get("sec_per_query"),
        "pinned_ext_wall_ratio": round(
            ext1.get("wall_seconds", 0) / max(ext01.get("wall_seconds", 1), 1e-9), 2
        ),
        "families": {
            f: v["median_ratio_10x_data"] for f, v in fams.items()
        },
    }
    art = {
        "what": "pinned comparator subsets + commit rows at sf0.1 vs "
                "sf1.0 (10x data, .scale/sf1 key-remapped replicas)",
        "compact": compact,
        "families": fams,
        "calibration": {
            "sf01": b01.get("calibration"),
            "sf1": b1.get("calibration"),
        },
        "queries": {
            n: {"sf01": q01[n], "sf1": q1[n],
                "ratio": round(q1[n] / max(q01[n], 1e-9), 2)}
            for n in both
        },
    }
    with open(ARTIFACT, "w") as f:
        json.dump(art, f, indent=1)
    report()


def run_rest() -> None:
    """The complement tier (§9j#1): every registry row NOT in the
    pinned comparators, at both scales — with `run`, the FULL
    registry has a 10× datapoint. commit: fixture rows are excluded
    from the stats here (the pinned tier already carries them)."""
    import statistics

    if not os.path.isdir(DST):
        build()
    b01 = _bench(SRC, "BENCH_SCALE_rest01.json", subset="rest")
    b1 = _bench(DST, "BENCH_SCALE_rest1.json", subset="rest")
    q01 = {k: v for k, v in b01["queries"].items()
           if not k.startswith("commit:")}
    q1 = {k: v for k, v in b1["queries"].items()
          if not k.startswith("commit:")}
    both = sorted(set(q01) & set(q1))
    measurable = [n for n in both if q01[n] > 0.05]
    ratios = {n: round(q1[n] / max(q01[n], 1e-9), 2) for n in both}
    worst = sorted(measurable, key=lambda n: -ratios[n])[:15]
    with open(ARTIFACT) as f:
        art = json.load(f)
    art["rest"] = {
        "what": "registry complement of the pinned comparators at "
                "sf0.1 vs sf1.0 (commit: rows excluded — pinned tier "
                "carries them)",
        "n": len(both),
        "median_ratio_10x_data": round(
            statistics.median(ratios[n] for n in measurable), 2
        ),
        "worst": {n: {"sf01": q01[n], "sf1": q1[n], "ratio": ratios[n]}
                  for n in worst},
        "queries": {
            n: {"sf01": q01[n], "sf1": q1[n], "ratio": ratios[n]}
            for n in both
        },
        "calibration": {
            "sf01": b01.get("calibration"),
            "sf1": b1.get("calibration"),
        },
    }
    art["compact"]["rest_n"] = len(both)
    art["compact"]["rest_median_ratio"] = art["rest"][
        "median_ratio_10x_data"
    ]
    with open(ARTIFACT, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps({"rest_n": len(both),
                      "rest_median": art["rest"]["median_ratio_10x_data"]}))
    for n in worst:
        print(f"  {n:44s} {q01[n]:7.2f}s -> {q1[n]:7.2f}s "
              f"{ratios[n]:5.2f}x")


def report() -> None:
    with open(ARTIFACT) as f:
        art = json.load(f)
    print(json.dumps(art["compact"], indent=1))
    print(f"{'family':34s} {'n':>3s} {'median×':>8s} {'max×':>6s}  worst")
    for fam, v in art["families"].items():
        print(f"{fam:34s} {v['n']:3d} {v['median_ratio_10x_data']:8.2f} "
              f"{v['max_ratio']:6.2f}  {v['max_query']}")
    worst = sorted(
        art["queries"].items(), key=lambda kv: -kv[1]["ratio"]
    )[:12]
    print("\nworst per-query ratios (10x data):")
    for n, v in worst:
        print(f"  {n:44s} {v['sf01']:7.2f}s -> {v['sf1']:7.2f}s  "
              f"{v['ratio']:5.2f}x")


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "run"
    {"build": build, "run": run, "run_rest": run_rest,
     "report": report}[cmd]()
