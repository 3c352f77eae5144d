#!/usr/bin/env bash
# One-command reproduction of the scale correctness gates (round 11
# protocol). Generates the 10x/100x corpora if absent, runs the Verify
# subsets, then every invariant + DuckDB gate that is feasible at each
# scale (the all-pairs oracles that are not feasible are replaced by
# the replica-structure gates — see BASELINE.md rounds 10-11).
#
# Usage: bash tools/scale_gates.sh            # sf1 (10x) gates
#        bash tools/scale_gates.sh sf10       # sf10 (100x) gates
# Expects to run from the repo root. ~15 min for sf1, ~25 min for sf10
# on local[32] (corpus generation adds ~1/6 min the first time).
set -euo pipefail

MODE="${1:-sf1}"
SF01_OUT=target/scale/verify_sf01_r12

gen() { # dir replicas
  if [ ! -d "$1/lineitem.parquet" ]; then
    sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 $1 $2"
  fi
}

if [ ! -d "$SF01_OUT/corpus_diff" ]; then
  SPARK_GRAFT_ONLY=q17_range_join,q44_salted_join,jl_project,corpus_diff,diverse_sample,media_phash,ann_ivfpq_topk,ann_ivfpq_warm,ann_ivfpq_batch_topk,ann_ivfpq_batch_warm,ann_ivf_batch_topk,ann_lsh_batch_topk,ann_ivf_append,ann_ivf_batch_warm,p6_issue_channel,p6_phenopacket_json,bpe_token_stats,winnow_fingerprint,duplicate_spans,duplicate_spans_sampled,exact_cosine_pairs,dedup_corpus,dedup_increment,dedup_increment_warm,minhash_neardup,semdedup,semdedup_planted,p6_workbooks_distributed,leakage_safe_split,token_budget_pack,boilerplate_strip,bm25_topk,containment_neardup,containment_hot_audit,hybrid_retrieval,text_normalize,weighted_sample \
    sbt -batch "runMain graft.Verify /root/testdata/sf0.1 $SF01_OUT"
fi

if [ "$MODE" = "sf1" ]; then
  gen /root/repo/target/scale/sf1 10
  S=target/scale/verify_sf1_r12
  SPARK_GRAFT_SHUFFLE=128 \
    SPARK_GRAFT_ONLY=q44_salted_join,jl_project,corpus_diff,diverse_sample,media_phash,ann_ivfpq_topk,ann_ivfpq_warm,ann_ivfpq_batch_topk,ann_ivfpq_batch_warm,ann_ivf_batch_topk,ann_lsh_batch_topk,ann_ivf_append,ann_ivf_batch_warm,p6_issue_channel,p6_phenopacket_json,bpe_token_stats,winnow_fingerprint,duplicate_spans,duplicate_spans_sampled,exact_cosine_pairs,dedup_corpus,dedup_increment,dedup_increment_warm,minhash_neardup,semdedup,semdedup_planted,p6_workbooks_distributed,leakage_safe_split,token_budget_pack,boilerplate_strip,bm25_topk,containment_neardup,containment_hot_audit,hybrid_retrieval,text_normalize,weighted_sample,bpe_train,bitext_mine,mmr_rerank,page_rank,pmi_cooccur,dsir_sample,kn_bigram_lm,bpe_encode \
    sbt -batch -mem 40960 "runMain graft.Verify target/scale/sf1 $S"
  python3 tools/sf1_invariant.py "$SF01_OUT" "$S" counts10x dedup_corpus
  python3 tools/sf1_invariant.py "$SF01_OUT" "$S" counts10x dedup_increment
  python3 tools/sf1_invariant.py "$SF01_OUT" "$S" counts10x dedup_increment_warm
  python3 tools/sf1_invariant.py "$SF01_OUT" "$S" shiftunion minhash_neardup a b
  python3 tools/sf1_invariant.py "$SF01_OUT" "$S" shiftunion containment_neardup a b
  python3 tools/sf1_invariant.py "$SF01_OUT" "$S" replica0 exact_cosine_pairs a b
  GRAFT_EXPECTED_PLANTED=360 \
    python3 tools/sf1_invariant.py "$SF01_OUT" "$S" semdedup semdedup
  GRAFT_EXPECTED_PLANTED=360 \
    python3 tools/sf1_invariant.py "$SF01_OUT" "$S" semdedup semdedup_planted
  python3 tools/sf1_invariant.py "$SF01_OUT" "$S" leakage leakage_safe_split
  # linear DuckDB oracles only — the all-pairs ones are gated above
  python3 tools/check.py target/scale/sf1 "$S" \
    q44_salted_join p6_issue_channel bpe_token_stats winnow_fingerprint \
    duplicate_spans duplicate_spans_sampled ann_ivf_batch_topk \
    ann_lsh_batch_topk ann_ivf_append ann_ivf_batch_warm \
    p6_workbooks_distributed p6_phenopacket_json semdedup_planted \
    token_budget_pack jl_project corpus_diff diverse_sample media_phash ann_ivfpq_topk ann_ivfpq_warm ann_ivfpq_batch_topk ann_ivfpq_batch_warm \
    boilerplate_strip bm25_topk containment_hot_audit hybrid_retrieval text_normalize weighted_sample bpe_train \
    bitext_mine mmr_rerank page_rank pmi_cooccur dsir_sample kn_bigram_lm bpe_encode
  # bitext_mine's all-pairs oracle is quadratic by contract: feasible
  # at sf1 (~22M pairs), excluded at sf10 (~2.2B) — the
  # exact_cosine_pairs policy.
  # bpe_train's chained-CTE oracle is ~4 min single-threaded DuckDB at
  # sf1 (linear in docs) — in-budget here; at sf10 it is ~40 min, so
  # the 100x DuckDB replay is a one-time check recorded in BASELINE.md
  # rather than a per-run gate.
else
  gen /root/repo/target/scale/sf10 100
  S=target/scale/verify_sf10_r12
  SPARK_DRIVER_MEM=48g SPARK_GRAFT_SHUFFLE=128 \
    SPARK_GRAFT_ONLY=jl_project,corpus_diff,diverse_sample,media_phash,ann_ivfpq_topk,ann_ivfpq_warm,ann_ivfpq_batch_topk,ann_ivfpq_batch_warm,dedup_corpus,dedup_increment,dedup_increment_warm,minhash_neardup,duplicate_spans,duplicate_spans_sampled,winnow_fingerprint,bpe_token_stats,p6_issue_channel,p6_workbooks_distributed,chunk_dedup,cdc_chunk_dedup,corpus_funnel,semdedup_planted,leakage_safe_split,token_budget_pack,boilerplate_strip,bm25_topk,containment_neardup,containment_hot_audit,hybrid_retrieval,text_normalize,weighted_sample,mmr_rerank,page_rank,pmi_cooccur,dsir_sample,kn_bigram_lm \
    sbt -batch -mem 49152 "runMain graft.Verify target/scale/sf10 $S"
  GRAFT_REPLICAS=100 python3 tools/sf1_invariant.py "$SF01_OUT" "$S" counts10x dedup_corpus
  GRAFT_REPLICAS=100 python3 tools/sf1_invariant.py "$SF01_OUT" "$S" counts10x dedup_increment
  GRAFT_REPLICAS=100 python3 tools/sf1_invariant.py "$SF01_OUT" "$S" counts10x dedup_increment_warm
  GRAFT_RECALL_FLOOR=0.999 GRAFT_REPLICAS=100 \
    python3 tools/sf1_invariant.py "$SF01_OUT" "$S" shiftsubset minhash_neardup a b
  GRAFT_REPLICAS=100 python3 tools/sf1_invariant.py "$SF01_OUT" "$S" shiftunion containment_neardup a b
  GRAFT_REPLICAS=100 GRAFT_EXPECTED_PLANTED=3960 \
    python3 tools/sf1_invariant.py "$SF01_OUT" "$S" semdedup semdedup_planted
  GRAFT_REPLICAS=100 \
    python3 tools/sf1_invariant.py "$SF01_OUT" "$S" leakage leakage_safe_split
  python3 tools/check.py target/scale/sf10 "$S" \
    p6_workbooks_distributed p6_issue_channel chunk_dedup cdc_chunk_dedup corpus_funnel \
    bpe_token_stats winnow_fingerprint duplicate_spans duplicate_spans_sampled semdedup_planted \
    token_budget_pack jl_project corpus_diff diverse_sample media_phash ann_ivfpq_topk ann_ivfpq_warm ann_ivfpq_batch_topk ann_ivfpq_batch_warm \
    boilerplate_strip bm25_topk containment_hot_audit hybrid_retrieval text_normalize weighted_sample mmr_rerank page_rank pmi_cooccur dsir_sample kn_bigram_lm
fi
echo "ALL $MODE GATES GREEN"
