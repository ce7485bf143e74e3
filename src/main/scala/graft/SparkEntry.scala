package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Advanced, AsOf, Events, Relational, TextOps, VectorOps}
import graft.dedup.{MinHashLSH, SimHash}
import graft.enrich.{Multimodal, Palette}
import graft.similarity.Ann
import graft.streaming.Replay

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` is an operator from SURVEY.md §2 (or a
  * training-data-pipeline extension) re-expressed Spark-first; `oracleSql`
  * carries the DuckDB-equivalent ANSI SQL the driver uses as the
  * correctness oracle at sf0.01. Column names and integer widths are
  * aligned between both sides (BIGINT for counts/sizes, DOUBLE for ratios,
  * epoch-micros longs for timestamps).
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q3JoinAgg(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary"   -> (Relational.q1PricingSummary _),
    "q2_filter_project"    -> (Relational.q2FilterProject _),
    "q3_join_agg"          -> (Relational.q3JoinAgg _),
    "q4_left_join_sentinel" -> (Relational.q4LeftJoinSentinel _),
    "q5_anti_join"         -> (Relational.q5AntiJoin _),
    "q6_semi_join"         -> (Relational.q6SemiJoin _),
    "q7_topk_groups"       -> (Events.q7TopkGroups _),
    "q8_latest_per_key"    -> (Events.q8LatestPerKey _),
    "q9_ordered_series"    -> (Events.q9OrderedSeries _),
    "q10_topn_per_key"     -> (Events.q10TopnPerKey _),
    "q11_quality_rowcounts" -> (Relational.q11QualityRowcounts _),
    "q12_quality_nulls"    -> (Relational.q12QualityNulls _),
    "q13_scalar_chain"     -> (Relational.q13ScalarChain _),
    "q14_time_features"    -> (Events.q14TimeFeatures _),
    "q15_json_extract"     -> (Events.q15JsonExtract _),
    "q16_set_ops"          -> (Relational.q16SetOps _),
    "q17_case_sentinel"    -> (Relational.q17CaseSentinel _),
    "q18_hourly_rollup"    -> (Events.q18HourlyRollup _),
    "q19_sessionize"       -> (Events.q19Sessionize _),
    "qd1_dedup_exact"      -> (TextOps.qd1DedupExact _),
    "qd2_token_count"      -> (TextOps.qd2TokenCount _),
    "qd3_quality_score"    -> (TextOps.qd3QualityScore _),
    "qd4_lang_id"          -> (TextOps.qd4LangId _),
    "qd5_fingerprint"      -> (TextOps.qd5Fingerprint _),
    "qd6_ngram_jaccard"    -> (TextOps.qd6NgramJaccard _),
    "qd7_keyword_search"   -> (TextOps.qd7KeywordSearch _),
    "qd8_bm25_search"      -> (graft.text.Search.qd8Bm25 _),
    // qd8's arrival-time form: incremental inverted-index statistics
    "qs27_stream_bm25"     -> (Replay.qs27StreamBm25 _),
    // qm5's arrival-time form: per-batch codec pass, append-only facts
    "qs30_stream_audio"    -> (Replay.qs30StreamAudio _),
    // qd40's arrival-time form: both retrieval indices in one stream
    "qs28_stream_hybrid"   -> (Replay.qs28StreamHybridRrf _),
    "qe1_knn_brute_force"  -> (VectorOps.qe1KnnBruteForce _),
    "qe2_neardup_pairs"    -> (VectorOps.qe2NearDupPairs _),
    // DBSCAN density clustering (core/border/noise) over the ε-graph
    "qe17_dbscan"          -> ((s, d) => VectorOps.qe17Dbscan(s, d)),
    // dominant principal direction via integer-moment power iteration
    "qe18_pca_power"       -> ((s, d) => graft.similarity.Pca.qe18PcaPower(s, d)),
    // qe18's arrival-time form: dim^2 sum-monoid state, O(1) in corpus
    "qs29_stream_pca"      -> (graft.streaming.PqStream.qs29StreamPca _),
    "qs33_stream_mmr"      -> (graft.streaming.PqStream.qs33StreamMmr _),
    // per-arrival-window embedding drift (qd31's embedding-space twin)
    "qe21_embedding_drift" -> ((s, d) => graft.similarity.Pca.qe21EmbeddingDrift(s, d)),
    // qe21's arrival-time form: O(windows x dim) sum-monoid state
    "qs31_stream_embdrift" -> (graft.streaming.PqStream.qs31StreamEmbDrift _),
    "qe3_label_stats"      -> (VectorOps.qe3LabelStats _),
    "q20_distinct_agg"     -> (Advanced.q20DistinctAgg _),
    "q21_rollup"           -> (Advanced.q21Rollup _),
    "q22_window_funcs"     -> (Advanced.q22WindowFuncs _),
    "q23_percentiles"      -> (Advanced.q23Percentiles _),
    "q24_asof_enrich"      -> (AsOf.q24AsOfEnrich _),
    "q25_approx_distinct"  -> (Advanced.q25ApproxDistinct _),
    "q26_band_join"        -> (Advanced.q26BandJoin _),
    "q27_series_aggregator" -> (Advanced.q27SeriesAggregator _),
    "q28_funnel"           -> (Advanced.q28Funnel _),
    "q29_cohort"           -> (Advanced.q29Cohort _),
    "q30_pivot"            -> (Advanced.q30Pivot _),
    "q31_scalar_subquery"  -> (Advanced.q31ScalarSubquery _),
    "q32_grouping_sets"    -> (Advanced.q32GroupingSets _),
    "q33_dedup_clusters"   -> (graft.dedup.Clusters.q33DedupClusters _),
    "q34_value_histogram"  -> (Advanced.q34ValueHistogram _),
    "qd9_term_stats"       -> (TextOps.qd9TermStats _),
    "q35_history_fact"     -> (graft.analytics.History.q35HistoryFact _),
    "qd11_chunking"        -> ((s, d) => TextOps.qd11Chunking(s, d)),
    "qd12_repetition"      -> (TextOps.qd12Repetition _),
    "qd13_pii_redaction"   -> (TextOps.qd13PiiRedaction _),
    "qd14_contamination"   -> (TextOps.qd14Contamination _),
    "qd15_stratified_sample" -> ((s, d) => TextOps.qd15StratifiedSample(s, d)),
    "qd16_domain_mixture"  -> (TextOps.qd16DomainMixture _),
    "qd17_edit_distance"   -> (TextOps.qd17EditDistance _),
    "qd18_unigram_logprob" -> (TextOps.qd18UnigramLogprob _),
    "qd19_tfidf_keywords"  -> (TextOps.qd19TfidfKeywords _),
    "qd20_sequence_pack"   -> ((s, d) => TextOps.qd20SequencePack(s, d)),
    // CCNet-style bigram-LM fluency score (add-one smoothed)
    "qd21_bigram_logprob"  -> (TextOps.qd21BigramLogprob _),
    // content-defined chunk dedup (stateless CDC boundaries)
    "qd22_cdc_chunk_dedup" -> (TextOps.qd22CdcChunkDedup _),
    // substring-level dedup: maximal duplicated K-token spans
    "qd23_dup_spans"       -> ((s, d) => TextOps.qd23DupSpans(s, d)),
    // Bloom-prefiltered eval-set decontamination keep-list
    "qd24_bloom_decontam"  -> ((s, d) => TextOps.qd24BloomDecontam(s, d)),
    // deterministic hash-based train/val/test split
    "qd25_hash_split"      -> ((s, d) => TextOps.qd25HashSplit(s, d)),
    // DSIR hashed-bigram importance weights (data selection)
    "qd26_dsir_weights"    -> ((s, d) => TextOps.qd26DsirWeights(s, d)),
    // BPE merge-candidate mining over the weighted vocabulary
    "qd27_bpe_pairs"       -> ((s, d) => TextOps.qd27BpePairs(s, d)),
    // qd27's merge step looped: 3 argmax-merge-recount iterations
    "qd28_bpe_merges"      -> ((s, d) => TextOps.qd28BpeMerges(s, d)),
    // per-source JS-divergence drift report over hashed unigram buckets
    "qd30_domain_drift"    -> ((s, d) => TextOps.qd30DomainDrift(s, d)),
    // qd30's arrival-time form: per-batch count-monoid deltas
    "qs19_stream_drift"    -> (Replay.qs19StreamDrift _),
    // per-arrival-window drift alarms (window-vs-lifetime JS per source)
    "qd31_windowed_drift"  -> ((s, d) => TextOps.qd31WindowedDrift(s, d)),
    "qs21_stream_wdrift"   -> (Replay.qs21StreamWindowedDrift _),
    // count-min-sketch heavy hitters: D×W counter grid, est-vs-exact
    "qd33_cms_heavy_hitters" -> ((s, d) => TextOps.qd33CmsHeavyHitters(s, d)),
    "qs22_stream_cms"      -> (Replay.qs22StreamCms _),
    // encode the corpus under the induced subword vocabulary
    "qd29_bpe_encode"      -> ((s, d) => TextOps.qd29BpeEncode(s, d)),
    // packed token-id training sequences (induce -> encode -> pack closed)
    "qd38_packed_sequences" -> ((s, d) => TextOps.qd38PackedSequences(s, d)),
    // per-sequence document spans (cross-doc attention-mask metadata)
    "qd39_packed_doc_spans" -> ((s, d) => TextOps.qd39PackedDocSpans(s, d)),
    // hybrid sparse+dense retrieval fused by reciprocal-rank fusion
    "qd40_hybrid_rrf"      -> (graft.text.Search.qd40HybridRrf _),
    // Unicode NFC + control-strip + whitespace-collapse cleaning
    "qd41_unicode_clean"   -> ((s, d) => TextOps.qd41UnicodeClean(s, d)),
    // Kneser-Ney smoothed bigram fluency (the production LM smoother)
    "qd42_kneser_ney"      -> ((s, d) => TextOps.qd42KneserNey(s, d)),
    // qd42's arrival-time form: Heaps'-bounded type-count monoid state
    "qs32_stream_kn"       -> (Replay.qs32StreamKneserNey _),
    // unigram-LM (SentencePiece-family) Viterbi segmentation — the
    // score-based tokenizer next to qd27-qd29's merge-based BPE
    "qd43_unigram_segment" -> (graft.text.Unigram.qd43UnigramSegment _),
    // qd43's arrival-time form: frozen capped vocabulary, O(batch) DP
    "qs36_stream_segment"  -> (Replay.qs36StreamSegment _),
    "q36_approx_percentile" -> (Advanced.q36ApproxPercentile _),
    "qd10_corpus_curation" -> (TextOps.qd10CorpusCuration _),
    "qs7_stream_sessionize" -> (Replay.streamSessionize _),
    "qs1_minhash_neardup"  -> ((s, d) => MinHashLSH.nearDups(s, d)),
    "qs2_simhash_neardup"  -> ((s, d) => SimHash.nearDups(s, d)),
    // the SEPARABLE palette configuration: constant-color images, ≤ 5
    // colors per group → converged KMeans == exact color histogram, so
    // the flagship kernel gets a hard SQL oracle (the non-separable
    // compute benchmark qs3 lives in `benchOnlyQueries`)
    "qs11_palette_exact"   -> (Palette.qs11PaletteExact _),
    // full probe: provably equals brute force (see Ann.knn scaladoc) →
    // shares qe1's oracle; low-probe recall is covered by AnnSpec
    "qs4_ann_ivf"          -> ((s, d) => Ann.knn(s, d, nprobe = Int.MaxValue)),
    // the REAL ANN configuration: nprobe=2 of 10 cells — cell restriction
    // actually bites, and the oracle reproduces the whole deterministic
    // pipeline (centroids → argmax assignment → probe ranking) in SQL
    "qs12_ann_lowprobe"    -> ((s, d) => Ann.knn(s, d, nprobe = 2)),
    // the same low-probe pipeline against a MATERIALIZED cell-partitioned
    // index (dynamic partition pruning reads only the probed cells)
    "qs14_ann_indexed"     -> (Ann.qs14AnnIndexed _),
    "qs5_stream_upsert"    -> ((s, dir) => Replay.streamUpsert(s, dir)),
    "qs6_stream_hourly"    -> (Replay.streamHourlyRollup _),
    "qm1_multimodal_features" -> (Multimodal.featureRollup _),
    "qm2_media_byteclass"  -> (Multimodal.qm2MediaByteclass _),
    // real MJPEG/AVI frame decode end to end; no SQL-expressible oracle
    // (a JPEG codec) → deliberately absent from oracleSql, so the
    // driver records its rows-only check; semantics spec-checked in
    // MultimodalSpec
    "qm3_video_frames"     -> (Multimodal.qm3VideoFrames _),
    // perceptual-hash image dedup: real PNG round trip, closed-form oracle
    "qm4_image_phash_dedup" -> (Multimodal.qm4ImagePhashDedup _),
    // qm4's arrival-time form: per-batch codec pass, append-only index
    "qs24_stream_phash"    -> (Replay.qs24StreamPhash _),
    // real WAV/PCM16 audio decode: integer signal features
    "qm5_audio_features"   -> (Multimodal.qm5AudioFeatures _),
    // multimodal flagship: quality + exact + near-dup + image-dup gates
    "qm6_multimodal_curation" -> (Multimodal.qm6MultimodalCuration _),
    "qm7_mp4_metadata"     -> (Multimodal.qm7Mp4Metadata _),
    "qm8_mp3_adts_metadata" -> (Multimodal.qm8Mp3AdtsMetadata _),
    "qm9_h264_dimensions"  -> (Multimodal.qm9H264Dimensions _),
    "qm10_mp4_samples"     -> (Multimodal.qm10Mp4Samples _),
    "qm11_keyframe_ranges" -> (Multimodal.qm11KeyframeRanges _),
    "qm12_aac_config"      -> (Multimodal.qm12AacConfig _),
    "qm13_ranged_fetch"    -> (Multimodal.qm13RangedFetch _),
    "qm14_pcm_decode"      -> (Multimodal.qm14PcmDecode _),
    "qm15_keyframe_thumb"  -> (Multimodal.qm15KeyframeThumb _),
    "qm16_adpcm_roundtrip" -> (Multimodal.qm16AdpcmRoundtrip _),
    "qm17_cavlc_decode"    -> (Multimodal.qm17CodedDecode _),
    "qm18_ac_transform"    -> (Multimodal.qm18AcDecode _),
    "qm19_chroma_decode"   -> (Multimodal.qm19ChromaDecode _),
    // qm7's arrival-time form: per-batch box walks into an append-only
    // metadata index
    "qs34_stream_mp4"      -> (Replay.qs34StreamMp4 _),
    // qm8's arrival-time form: per-batch frame walks, append-only index
    "qs35_stream_mpeg_audio" -> (Replay.qs35StreamMpegAudio _),
    // qm6's arrival-time form: one stream, both curation indices per batch
    "qs26_stream_curation" -> (Replay.qs26StreamCuration _),
    "qs8_winnow_candidates" -> (graft.text.Fingerprint.fingerprintCandidates(_, _)),
    "qs9_srp_lsh_neardup"  -> (graft.similarity.SrpLsh.qs9NearDups _),
    "qs10_stream_dedup"    -> (Replay.qs10StreamDedup _),
    // incremental substring-level dedup (qd23's arrival-time form)
    "qs16_stream_dup_spans" -> (Replay.qs16StreamDupSpans _),
    // incremental DSIR scoring (qd26's arrival-time form): per-batch
    // monoid deltas, model derived from folded counts at read time
    "qs17_stream_dsir"     -> (Replay.qs17StreamDsir _),
    // streaming incremental NEAR-dup: per-batch signature kernel + band
    // probe against accumulated state; emission union == batch qs1
    "qs13_stream_neardup"  -> (Replay.qs13StreamNearDup _),
    // SemDeDup-style semantic dedup: k-means cell × sign-bit sub-bucket
    // quantizer, within-cell exact cosine, rep-graph components → keep-list
    "qe4_semantic_dedup"   -> (graft.similarity.SemDedup.qe4SemanticDedup _),
    // indexed/incremental form == batch qe4 (shares its oracle): base
    // materialized partitionBy(cell), increment probes with DPP
    "qe5_semdedup_indexed" -> (graft.similarity.SemDedup.qe5SemanticDedupIndexed _),
    // streaming incremental semantic dedup: frozen quantizer, per-batch
    // novel-digest assignment probing the persisted cell index, final
    // keep-list == batch qe4 (shares its oracle)
    "qs15_stream_semdedup" -> ((s, d) =>
      graft.streaming.SemDedupStream.qs15StreamSemDedup(s, d)),
    // per-cell occupancy + cohesion report under the family quantizer
    "qe6_cluster_stats"    -> (Ann.qe6ClusterStats _),
    // recall@k of the low-probe IVF search vs exact ground truth on a
    // deterministic query sample (the index-quality report)
    "qe7_ann_recall"       -> ((s, d) => Ann.qe7AnnRecall(s, d)),
    // product-quantization ADC top-k (compressed-domain ANN)
    "qe8_pq_topk"          -> ((s, d) => Ann.qe8PqTopk(s, d)),
    // cap BELOW the gate's Q (sf0.01: 20 sampled queries) so the hashed
    // truncation order is what the hash-match actually exercises
    "qe8_pq_topk_cap8"     -> ((s, d) => Ann.qe8PqTopk(s, d, maxQ = 8)),
    // qe8's arrival-time form: frozen codebook, append-only codes index
    "qs18_stream_pq"       -> (graft.streaming.PqStream.qs18StreamPq _),
    // IVF-PQ composition: probed cells restrict the integer ADC ranking
    "qe9_ivfpq_topk"       -> ((s, d) => Ann.qe9IvfPqTopk(s, d)),
    // IVF-PQ with residual encoding (the FAISS IVFPQ, Jégou §IV-A)
    "qe10_ivfpq_residual"  -> ((s, d) => Ann.qe10IvfPqResidualTopk(s, d)),
    // qe9's arrival-time form: cell-partitioned append-only codes index
    "qs20_stream_ivfpq"    -> (graft.streaming.PqStream.qs20StreamIvfPq _),
    // scalar quantization (SQ8): per-dim affine 8-bit codes, integer dot
    "qe11_sq_topk"         -> ((s, d) => Ann.qe11SqTopk(s, d)),
    // qe11's arrival-time form: frozen ranges, append-only codes index
    "qs23_stream_sq"       -> (graft.streaming.PqStream.qs23StreamSq _),
    // Matryoshka two-stage: prefix-dim coarse top-C, full-dim rerank
    "qe12_truncated_rerank" -> ((s, d) => Ann.qe12TruncatedRerank(s, d)),
    // cluster-balanced diversity sampling: per-cell ceil-20% quotas
    "qe13_cluster_sample"  -> (Ann.qe13ClusterSample _),
    // MMR-diversified top-k: relevance vs redundancy greedy rerank
    "qe15_mmr_topk"        -> ((s, d) => Ann.qe15MmrTopk(s, d)),
    // label-graded nDCG@k + MRR of the SQ8 ranking (IR quality pair)
    "qe19_ndcg_eval"       -> ((s, d) => Ann.qe19NdcgEval(s, d)),
    // IVF-SQ8: cell-pruned scalar-quantized search (FAISS "IVF,SQ8")
    "qe20_ivfsq_topk"      -> ((s, d) => Ann.qe20IvfSqTopk(s, d)),
    // index advisor: recall@5 of every compression method vs exact
    "qe14_index_advisor"   -> ((s, d) => Ann.qe14IndexAdvisor(s, d)),
    // temperature mixture: alpha=0.5 quotas over lang strata
    "qd34_temperature_mixture" -> ((s, d) => TextOps.qd34TemperatureMixture(s, d)),
    // leakage-safe split: qd25's hash keyed by the near-dup cluster rep
    "qd35_leak_safe_split" -> (TextOps.qd35LeakSafeSplit _),
    // qd35's arrival-time form: split map derived from streamed pair state
    "qs25_stream_leak_split" -> (Replay.qs25StreamLeakSplit _),
    // integer-deterministic PageRank over the near-dup graph
    "qd36_pagerank" -> ((s, d) => TextOps.qd36PageRank(s, d)),
    // interpolated trigram-LM fluency scoring (the LM family at depth 3)
    "qd37_trigram_logprob" -> (TextOps.qd37TrigramLogprob _),
  )

  /** Benchmark-only queries: measured by `graft.Bench` but NOT part of
    * the oracle-checked correctness surface. qs3 is the NON-separable
    * per-group KMeans over arbitrary text-derived pixels — no
    * SQL-expressible oracle exists; its semantics are driver-checked
    * through `qs11_palette_exact` (same kernel, separable configuration)
    * and spec-checked for determinism/golden palettes, while this entry
    * keeps the production compute shape on the benchmark clock. */
  def benchOnlyQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qs3_palette_by_source" -> (Palette.paletteBySource _),
    // explicit PQ-family model build: evicts the codebook memos and
    // retrains plain PQ + refined coarse centroids + residual PQ inside
    // its own timed window, so the PQ queries (qe8/qe9/qe10/qs18/qs20)
    // are billed as memo-served searches — the production
    // train-once/serve-many split. Sorts before every q{d,e,m,s} entry,
    // so within a pass it is always the trainer. Bench-only: the
    // trained models themselves are oracle-proven through their
    // consumers' full-mirror SQL (qe8/qe9/qe10), which would be
    // vacuously re-proven here.
    "qb1_pq_model_build" -> ((s, d) => Ann.buildPqModels(s, d)),
  )

  /** The low-probe IVF oracle, shared VERBATIM by qs12 (in-memory) and
    * qs14 (materialized index): the two queries are row-identical by
    * construction, and binding one SQL value to both keys makes that
    * invariant un-driftable. */
  private val annLowProbeOracle: String =
    """WITH e AS (
        |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
        |), comp AS (
        |  SELECT label AS cell, i AS dim, avg(v[i::INT]) AS m
        |  FROM e CROSS JOIN unnest(range(1, len(v) + 1)) r(i)
        |  GROUP BY label, i
        |), cents AS (
        |  SELECT cell, list(m ORDER BY dim) AS centroid FROM comp GROUP BY cell
        |), assign AS (
        |  SELECT vec_id, cell, v FROM (
        |    SELECT e.vec_id, c.cell, e.v,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        round(list_inner_product(e.v, c.centroid)
        |          / (sqrt(list_inner_product(e.v, e.v))
        |             * sqrt(list_inner_product(c.centroid, c.centroid))), 6) DESC,
        |        c.cell) AS rk
        |    FROM e CROSS JOIN cents c
        |  ) WHERE rk = 1
        |), q AS (
        |  SELECT vec_id AS q_id, v AS q_vec FROM e WHERE vec_id < 5
        |), probed AS (
        |  SELECT q_id, q_vec, cell FROM (
        |    SELECT q.q_id, q.q_vec, c.cell,
        |      row_number() OVER (PARTITION BY q.q_id ORDER BY
        |        round(list_inner_product(q.q_vec, c.centroid)
        |          / (sqrt(list_inner_product(q.q_vec, q.q_vec))
        |             * sqrt(list_inner_product(c.centroid, c.centroid))), 6) DESC,
        |        c.cell) AS crk
        |    FROM q CROSS JOIN cents c
        |  ) WHERE crk <= 2
        |), s AS (
        |  SELECT p.q_id, a.vec_id AS cand_id,
        |    round(list_inner_product(p.q_vec, a.v)
        |      / (sqrt(list_inner_product(p.q_vec, p.q_vec))
        |         * sqrt(list_inner_product(a.v, a.v))), 6) AS sim
        |  FROM probed p JOIN assign a USING (cell)
        |  WHERE p.q_id <> a.vec_id
        |), r AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY q_id ORDER BY sim DESC, cand_id) AS rank
        |  FROM s
        |)
        |SELECT q_id, rank, cand_id, sim FROM r
        |WHERE rank <= 5
        |ORDER BY q_id, rank""".stripMargin

  /** Shared DuckDB fragment: the verified shingle-Jaccard near-dup pair
    * graph (qs1/qs13 emit it; q33/qd10 resolve components over it).
    *
    * INVERTED-INDEX form, exact by construction (this is what makes the
    * oracle feasible one SF above the gate, where the old all-pairs join
    * ground for 15+ minutes):
    *   - Jaccard >= 0.8 > 0 requires at least one SHARED shingle, so the
    *     shingle self-join loses no qualifying pair;
    *   - the length bound is implied by the threshold: |A∩B| <= min(|A|,
    *     |B|) and J >= t force min >= t·|A∪B| >= t·max(|A|,|B|);
    *   - the old `len(sh) > 0` NaN guard (0/0 = NaN passes >= under
    *     NaN-is-greatest) is SUBSUMED: an empty shingle set shares no
    *     shingle and never reaches the verify stage;
    *   - `MATERIALIZED` pins each CTE to one evaluation (DuckDB inlines
    *     multiply-referenced CTEs otherwise — the shingle kernel would
    *     run once per reference). */
  private val shinglePairGraphSql: String =
    """t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents
      |), d AS MATERIALIZED (
      |  SELECT doc_id,
      |    CASE WHEN len(toks) >= 3 THEN list_distinct(
      |      list_transform(range(1, len(toks) - 1),
      |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
      |    ELSE [] END AS sh
      |  FROM t
      |), inv AS MATERIALIZED (
      |  SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM d
      |), cand AS MATERIALIZED (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
      |    AND least(a.n, b.n)::DOUBLE >= 0.8 * greatest(a.n, b.n)::DOUBLE
      |), p AS MATERIALIZED (
      |  SELECT doc_a, doc_b, j AS jaccard FROM (
      |    SELECT c.doc_a, c.doc_b,
      |      len(list_intersect(da.sh, db.sh))::DOUBLE
      |        / len(list_distinct(list_concat(da.sh, db.sh)))::DOUBLE AS j
      |    FROM cand c JOIN d da ON da.doc_id = c.doc_a
      |                JOIN d db ON db.doc_id = c.doc_b)
      |  WHERE j >= 0.8
      |)""".stripMargin

  /** Shared banded-blocking CTE prefix for the qe2/qe17 oracles — the
    * in-SQL mirror of VectorOps.bandedLabelPairs: e (widened vectors),
    * params (the adaptive band width, SemDedup.subBits' s = clamp(4, 16,
    * ⌊log2 n⌋ − 7) via length(bin(n)) − 1), and w with one sign-bit
    * bucket per band over disjoint coordinate windows. Band count and
    * width policy interpolate from the operator so a default change
    * fails loudly here. */
  private val bandedBlockSql: String = {
    val bandDefs = (0 until graft.operators.VectorOps.NearDupBands).map { j =>
      s"""    list_sum(list_transform(range(0, p.s),
         |      i -> CASE WHEN v[($j * p.s + i + 1)::INT] >= 0
         |           THEN (1::BIGINT << i) ELSE 0 END)) AS b$j""".stripMargin
    }.mkString(",\n")
    s"""e AS (
       |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
       |), params AS (
       |  SELECT greatest(4, least(16, length(bin(count(*))) - 1 - 7)) AS s
       |  FROM e
       |), w AS MATERIALIZED (
       |  SELECT vec_id, label, v, sqrt(list_inner_product(v, v)) AS nrm,
       |$bandDefs
       |  FROM e CROSS JOIN params p
       |)""".stripMargin
  }

  /** Any-band collision predicate over w's per-band buckets (aliases a/b). */
  private val bandMatchSql: String =
    (0 until graft.operators.VectorOps.NearDupBands)
      .map(j => s"a.b$j = b.b$j").mkString(" OR ")

  /** DuckDB oracle for semantic dedup — shared by qe4 (batch) and
    * qs15 (streaming): see the binding comment in oracleSql. */
  private val semanticDedupOracle: String =
      """WITH RECURSIVE e AS (
        |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
        |), pert AS (
        |  SELECT a.vec_id + 100000 AS vec_id, a.label,
        |    list_transform(range(1, len(a.v) + 1),
        |      i -> 0.95 * a.v[i] + 0.05 * c.v[i]) AS v
        |  FROM e a JOIN e c ON c.vec_id = a.vec_id + 1
        |), u AS (
        |  SELECT vec_id, label, v FROM e
        |  UNION ALL SELECT vec_id, label, v FROM pert
        |), params AS (
        |  SELECT greatest(4, least(16, length(bin(count(*))) - 1 - 7)) AS s
        |  FROM u
        |), comp AS (
        |  SELECT label AS cell, i AS dim, avg(v[i::INT]) AS m
        |  FROM u CROSS JOIN unnest(range(1, len(v) + 1)) r(i)
        |  GROUP BY label, i
        |), cents AS (
        |  SELECT cell, list(m ORDER BY dim) AS centroid FROM comp GROUP BY cell
        |), assign AS (
        |  SELECT vec_id, cell, v FROM (
        |    SELECT u.vec_id, c.cell, u.v,
        |      row_number() OVER (PARTITION BY u.vec_id ORDER BY
        |        round(list_inner_product(u.v, c.centroid)
        |          / (sqrt(list_inner_product(u.v, u.v))
        |             * sqrt(list_inner_product(c.centroid, c.centroid))), 6) DESC,
        |        c.cell) AS rk
        |    FROM u CROSS JOIN cents c
        |  ) WHERE rk = 1
        |), sb AS (
        |  SELECT vec_id, cell, v,
        |    list_sum(list_transform(range(0, p.s),
        |      i -> CASE WHEN v[(i + 1)::INT] >= 0 THEN (1::BIGINT << i)
        |           ELSE 0 END)) AS sub
        |  FROM assign CROSS JOIN params p
        |), pr AS (
        |  SELECT a.vec_id AS doc_a, b2.vec_id AS doc_b
        |  FROM sb a JOIN sb b2
        |    ON a.cell = b2.cell AND a.sub = b2.sub AND a.vec_id < b2.vec_id
        |  WHERE isfinite(round(list_inner_product(a.v, b2.v)
        |      / (sqrt(list_inner_product(a.v, a.v))
        |         * sqrt(list_inner_product(b2.v, b2.v))), 6))
        |    AND round(list_inner_product(a.v, b2.v)
        |      / (sqrt(list_inner_product(a.v, a.v))
        |         * sqrt(list_inner_product(b2.v, b2.v))), 6) >= 0.95
        |), ed AS (
        |  SELECT doc_a AS ea, doc_b AS eb FROM pr
        |  UNION SELECT doc_b, doc_a FROM pr
        |), rr(src, reach) AS (
        |  SELECT ea, ea FROM (SELECT DISTINCT ea FROM ed)
        |  UNION
        |  SELECT rr.src, ed.eb FROM rr JOIN ed ON rr.reach = ed.ea
        |), cc AS (
        |  SELECT src AS vec_id, min(reach) AS cmin FROM rr GROUP BY src
        |)
        |SELECT u.vec_id,
        |  coalesce(cc.cmin, u.vec_id) AS cluster_rep,
        |  (coalesce(cc.cmin, u.vec_id) = u.vec_id) AS keep
        |FROM u LEFT JOIN cc USING (vec_id)
        |ORDER BY u.vec_id""".stripMargin

  /** The qd26/qs17 shared oracle (both halves of DSIR are sufficient-
    * statistic monoids, so the streaming form converges to exactly this
    * batch computation): hashed-bigram (B = 1024) target/raw bucket
    * counts, add-one-smoothed log importance ratios, per-raw-doc mean. */
  private val driftSql: String =
    """WITH sb AS (
        |  SELECT source,
        |    (md5_number_lower('drift:' || term) % 1024)::INT AS bucket,
        |    count(*) AS c
        |  FROM (
        |    SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS term
        |    FROM documents
        |  ) WHERE term <> ''
        |  GROUP BY 1, 2
        |), byb AS (
        |  SELECT bucket, sum(c)::BIGINT AS cb FROM sb GROUP BY bucket
        |), bys AS (
        |  SELECT source, sum(c)::BIGINT AS ns FROM sb GROUP BY source
        |), tot AS (
        |  SELECT sum(c)::DOUBLE AS n FROM sb
        |), grid AS (
        |  SELECT s.source, b.bucket, b.cb, s.ns,
        |    coalesce(sb.c, 0)::BIGINT AS c, t.n
        |  FROM byb b CROSS JOIN bys s CROSS JOIN tot t
        |  LEFT JOIN sb ON sb.source = s.source AND sb.bucket = b.bucket
        |), j AS (
        |  SELECT source, ns,
        |    CAST(round((0.5 * p * ln(p / mid) + 0.5 * q * ln(q / mid)) * 1e9)
        |      AS BIGINT) AS js_nanos
        |  FROM (
        |    SELECT source, ns,
        |      (c + 1)::DOUBLE / (ns + 1024) AS p,
        |      (cb - c + 1)::DOUBLE / (n - ns + 1024) AS q,
        |      ((c + 1)::DOUBLE / (ns + 1024)
        |        + (cb - c + 1)::DOUBLE / (n - ns + 1024)) / 2 AS mid
        |    FROM grid
        |  )
        |)
        |SELECT source, ns AS n_tokens, sum(js_nanos)::BIGINT AS js_nanos,
        |  round(sum(js_nanos)::BIGINT / 1e9, 6) AS js
        |FROM j GROUP BY source, ns
        |ORDER BY source""".stripMargin

  /** qd33/qs22 shared oracle: exact term counts → the 4×16 CMS counter
    * grid under the seeded md5 bucket hash (md5_number_lower % 16 ==
    * the Spark side's low-two-LE-bytes trick, 16 | 2^16) → per-term
    * min-over-rows estimate beside the exact count. */
  private val cmsSql: String =
    s"""WITH tc AS (
        |  SELECT term, count(*)::BIGINT AS c FROM (
        |    SELECT unnest(string_split_regex(trim(text), '\\s+')) AS term
        |    FROM documents
        |  ) WHERE term <> '' GROUP BY 1
        |), d AS (
        |  SELECT unnest(range(0, ${TextOps.DefaultCmsDepth})) AS j
        |), sk AS (
        |  SELECT j,
        |    (md5_number_lower('cms' || j || ':' || term)
        |      % ${TextOps.DefaultCmsWidth})::INT AS bucket,
        |    sum(c)::BIGINT AS c
        |  FROM tc CROSS JOIN d GROUP BY 1, 2
        |), est AS (
        |  SELECT t.term, t.c AS exact, min(s.c)::BIGINT AS est
        |  FROM tc t CROSS JOIN d
        |  JOIN sk s ON s.j = d.j AND s.bucket =
        |    (md5_number_lower('cms' || d.j || ':' || t.term)
        |      % ${TextOps.DefaultCmsWidth})::INT
        |  GROUP BY 1, 2
        |)
        |SELECT term, est, exact, (est - exact)::BIGINT AS overcount,
        |  row_number() OVER (ORDER BY est DESC, term) AS rank
        |FROM est ORDER BY rank""".stripMargin

  private val windowedDriftSql: String =
    """WITH swb AS (
        |  SELECT source, (doc_id // 250) AS w,
        |    (md5_number_lower('drift:' || term) % 1024)::INT AS bucket,
        |    count(*) AS c
        |  FROM (
        |    SELECT source, doc_id,
        |      unnest(string_split_regex(trim(text), '\s+')) AS term
        |    FROM documents
        |  ) WHERE term <> ''
        |  GROUP BY 1, 2, 3
        |), bysb AS (
        |  SELECT source, bucket, sum(c)::BIGINT AS cs FROM swb GROUP BY 1, 2
        |), bys AS (
        |  SELECT source, sum(c)::BIGINT AS ns FROM swb GROUP BY 1
        |), bysw AS (
        |  SELECT source, w, sum(c)::BIGINT AS nsw FROM swb GROUP BY 1, 2
        |), grid AS (
        |  SELECT sb.source, sw.w, sb.cs, sw.nsw, s.ns,
        |    coalesce(x.c, 0)::BIGINT AS c
        |  FROM bysb sb
        |  JOIN bysw sw ON sw.source = sb.source
        |  JOIN bys s ON s.source = sb.source
        |  LEFT JOIN swb x ON x.source = sb.source AND x.w = sw.w
        |    AND x.bucket = sb.bucket
        |), j AS (
        |  SELECT source, w, nsw,
        |    CAST(round((0.5 * p * ln(p / mid) + 0.5 * q * ln(q / mid)) * 1e9)
        |      AS BIGINT) AS js_nanos
        |  FROM (
        |    SELECT source, w, nsw,
        |      (c + 1)::DOUBLE / (nsw + 1024) AS p,
        |      (cs + 1)::DOUBLE / (ns + 1024) AS q,
        |      ((c + 1)::DOUBLE / (nsw + 1024)
        |        + (cs + 1)::DOUBLE / (ns + 1024)) / 2 AS mid
        |    FROM grid
        |  )
        |)
        |SELECT source, w, nsw AS n_tokens, sum(js_nanos)::BIGINT AS js_nanos,
        |  round(sum(js_nanos)::BIGINT / 1e9, 6) AS js
        |FROM j GROUP BY source, w, nsw
        |ORDER BY source, w""".stripMargin

  private val resPqSql: String =
      s"""WITH e AS (
        |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
        |), comp AS (
        |  SELECT label AS cell, i AS dim, avg(v[i::INT]) AS m
        |  FROM e CROSS JOIN unnest(range(1, len(v) + 1)) r(i)
        |  GROUP BY 1, 2
        |), cents AS (
        |  SELECT cell, list(m ORDER BY dim) AS centroid FROM comp GROUP BY cell
        |), ${centRefineChainSql(Ann.DefaultCoarseRefineIters)}, assign AS (
        |  SELECT vec_id, cell, v FROM (
        |    SELECT e.vec_id, c.cell, e.v,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        round(list_inner_product(e.v, c.centroid)
        |          / (sqrt(list_inner_product(e.v, e.v))
        |             * sqrt(list_inner_product(c.centroid, c.centroid))), 6) DESC,
        |        c.cell) AS rk
        |    FROM e CROSS JOIN ccents${Ann.DefaultCoarseRefineIters} c
        |  ) WHERE rk = 1
        |), res AS MATERIALIZED (
        |  SELECT a.vec_id, a.cell,
        |    list_transform(range(1, len(a.v) + 1),
        |      i -> round(a.v[i::INT] - c.centroid[i::INT], 6)) AS rv
        |  FROM assign a JOIN ccents${Ann.DefaultCoarseRefineIters} c USING (cell)
        |), rsv AS MATERIALIZED (
        |  SELECT vec_id, cell, s.sub,
        |    list_transform(range(s.sub * 16 + 1, s.sub * 16 + 17),
        |      j -> rv[j::INT]) AS x
        |  FROM res CROSS JOIN (SELECT unnest(range(0, 4)) AS sub) s
        |), rnn AS (
        |  SELECT count(*) AS n FROM e
        |), rsd AS MATERIALIZED (
        |  SELECT rk.sub, (((rk.rn - 1) * ${Ann.DefaultPqCodes}) // rnn.n)::INT
        |    AS code, rk.x
        |  FROM (
        |    SELECT rsv.sub, rsv.vec_id, rsv.x,
        |      row_number() OVER (PARTITION BY rsv.sub
        |        ORDER BY rsv.x[1], rsv.vec_id) AS rn
        |    FROM rsv
        |  ) rk CROSS JOIN rnn
        |), rcomp AS (
        |  SELECT sub, code, r.i AS dim, avg(x[r.i::INT]) AS mv
        |  FROM rsd CROSS JOIN unnest(range(1, len(x) + 1)) r(i)
        |  GROUP BY 1, 2, 3
        |), rcb0 AS MATERIALIZED (
        |  SELECT sub, code, list(mv ORDER BY dim) AS cw FROM rcomp
        |  GROUP BY sub, code
        |), ${pqRefineChainSql("rsv", "rcb0", "r", Ann.DefaultPqRefineIters)},
        |rcodes AS (
        |  SELECT vec_id, cell, sub, code FROM (
        |    SELECT vec_id, cell, sub, code,
        |      row_number() OVER (PARTITION BY vec_id, sub
        |        ORDER BY round(d2, 6), code) AS rk
        |    FROM (
        |      SELECT rsv.vec_id, rsv.cell, rsv.sub, rcb.code,
        |        list_inner_product(x, x) - 2 * list_inner_product(x, cw)
        |          + list_inner_product(cw, cw) AS d2
        |      FROM rsv JOIN rcb${Ann.DefaultPqRefineIters} rcb ON rcb.sub = rsv.sub
        |    )
        |  ) WHERE rk = 1
        |), qsel AS (
        |  SELECT vec_id FROM e WHERE vec_id % 25 = 0
        |  ORDER BY (vec_id * 1000003) % 999983, vec_id LIMIT ${Ann.DefaultMaxQueries}
        |), q AS (
        |  SELECT vec_id AS q_id, v AS q_vec FROM e JOIN qsel USING (vec_id)
        |), probed AS MATERIALIZED (
        |  SELECT q_id, cell, qrv FROM (
        |    SELECT q.q_id, c.cell,
        |      list_transform(range(1, len(q.q_vec) + 1),
        |        i -> round(q.q_vec[i::INT] - c.centroid[i::INT], 6)) AS qrv,
        |      row_number() OVER (PARTITION BY q.q_id ORDER BY
        |        round(list_inner_product(q.q_vec, c.centroid)
        |          / (sqrt(list_inner_product(q.q_vec, q.q_vec))
        |             * sqrt(list_inner_product(c.centroid, c.centroid))), 6) DESC,
        |        c.cell) AS crk
        |    FROM q CROSS JOIN ccents${Ann.DefaultCoarseRefineIters} c
        |  ) WHERE crk <= 2
        |), rlut AS (
        |  SELECT p.q_id, p.cell, p.sub, rcb.code,
        |    CAST(round((list_inner_product(x, x) - 2 * list_inner_product(x, cw)
        |      + list_inner_product(cw, cw)) * 1e6) AS BIGINT) AS d2us
        |  FROM (
        |    SELECT q_id, cell, s.sub,
        |      list_transform(range(s.sub * 16 + 1, s.sub * 16 + 17),
        |        j -> qrv[j::INT]) AS x
        |    FROM probed CROSS JOIN (SELECT unnest(range(0, 4)) AS sub) s
        |  ) p JOIN rcb${Ann.DefaultPqRefineIters} rcb ON rcb.sub = p.sub
        |), adc AS (
        |  SELECT l.q_id, co.vec_id AS cand_id, sum(l.d2us)::BIGINT AS adc_us
        |  FROM rcodes co
        |  JOIN rlut l ON l.cell = co.cell AND l.sub = co.sub AND l.code = co.code
        |  WHERE co.vec_id <> l.q_id
        |  GROUP BY 1, 2
        |)
        |SELECT q_id, rank, cand_id, adc_us FROM (
        |  SELECT q_id, cand_id, adc_us,
        |    row_number() OVER (PARTITION BY q_id ORDER BY adc_us, cand_id) AS rank
        |  FROM adc
        |) WHERE rank <= 5
        |ORDER BY q_id, rank""".stripMargin

  private val sqSql: String =
      s"""WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |), st AS (
        |  SELECT i AS dim, min(v[i::INT]) AS mn, max(v[i::INT]) AS mx
        |  FROM e CROSS JOIN unnest(range(1, len(v) + 1)) r(i)
        |  GROUP BY 1
        |), w AS (
        |  SELECT dim,
        |    CASE WHEN mx > mn
        |      THEN CAST(round(((mx - mn) / 255.0) * ((mx - mn) / 255.0)
        |                      * 1e12) AS BIGINT)
        |      ELSE 0 END AS w
        |  FROM st
        |), wl AS (
        |  SELECT list(w ORDER BY dim) AS w FROM w
        |), codes AS MATERIALIZED (
        |  SELECT vec_id, list(c ORDER BY dim) AS cl FROM (
        |    SELECT e.vec_id, st.dim,
        |      CASE WHEN st.mx > st.mn
        |        THEN CAST(round((e.v[st.dim::INT] - st.mn) * 255.0
        |                        / (st.mx - st.mn)) AS INT)
        |        ELSE 0 END AS c
        |    FROM e CROSS JOIN unnest(range(1, len(v) + 1)) r(i)
        |    JOIN st ON st.dim = r.i
        |  ) GROUP BY vec_id
        |), qsel AS (
        |  SELECT vec_id FROM e WHERE vec_id % 25 = 0
        |  ORDER BY (vec_id * 1000003) % 999983, vec_id
        |  LIMIT ${Ann.DefaultMaxQueries}
        |), score AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
        |    CAST(list_sum(list_transform(range(1, len(qc.cl) + 1),
        |      i -> w.w[i::INT] * (qc.cl[i::INT] - c.cl[i::INT])
        |                       * (qc.cl[i::INT] - c.cl[i::INT])))
        |      AS BIGINT) AS d2_units
        |  FROM qsel q JOIN codes qc ON qc.vec_id = q.vec_id
        |  CROSS JOIN codes c CROSS JOIN wl w
        |  WHERE c.vec_id <> q.vec_id
        |)
        |SELECT q_id, rank, cand_id, d2_units FROM (
        |  SELECT q_id, cand_id, d2_units,
        |    row_number() OVER (PARTITION BY q_id
        |      ORDER BY d2_units, cand_id) AS rank
        |  FROM score
        |) WHERE rank <= ${Ann.DefaultTopK}
        |ORDER BY q_id, rank""".stripMargin

  /** qe20's oracle: the qe11 SQ8 encode CTEs + the qe9 cell/probe CTEs,
    * with the weighted-L2 score restricted to candidates whose assigned
    * cell is among the query's nprobe best — every stage a proven
    * mirror, composed. */
  private val ivfSqSql: String =
      s"""WITH e AS (
        |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
        |), st AS (
        |  SELECT i AS dim, min(v[i::INT]) AS mn, max(v[i::INT]) AS mx
        |  FROM e CROSS JOIN unnest(range(1, len(v) + 1)) r(i)
        |  GROUP BY 1
        |), w AS (
        |  SELECT dim,
        |    CASE WHEN mx > mn
        |      THEN CAST(round(((mx - mn) / 255.0) * ((mx - mn) / 255.0)
        |                      * 1e12) AS BIGINT)
        |      ELSE 0 END AS w
        |  FROM st
        |), wl AS (
        |  SELECT list(w ORDER BY dim) AS w FROM w
        |), codes AS MATERIALIZED (
        |  SELECT vec_id, list(c ORDER BY dim) AS cl FROM (
        |    SELECT e.vec_id, st.dim,
        |      CASE WHEN st.mx > st.mn
        |        THEN CAST(round((e.v[st.dim::INT] - st.mn) * 255.0
        |                        / (st.mx - st.mn)) AS INT)
        |        ELSE 0 END AS c
        |    FROM e CROSS JOIN unnest(range(1, len(v) + 1)) r(i)
        |    JOIN st ON st.dim = r.i
        |  ) GROUP BY vec_id
        |), qsel AS (
        |  SELECT vec_id FROM e WHERE vec_id % 25 = 0
        |  ORDER BY (vec_id * 1000003) % 999983, vec_id
        |  LIMIT ${Ann.DefaultMaxQueries}
        |), cents AS (
        |  SELECT cell, list(m ORDER BY dim) AS centroid FROM (
        |    SELECT label AS cell, i AS dim, avg(v[i::INT]) AS m
        |    FROM e CROSS JOIN unnest(range(1, len(v) + 1)) r(i)
        |    GROUP BY 1, 2
        |  ) GROUP BY cell
        |), assign AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT e.vec_id, c.cell,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        round(list_inner_product(e.v, c.centroid)
        |          / (sqrt(list_inner_product(e.v, e.v))
        |             * sqrt(list_inner_product(c.centroid, c.centroid))), 6) DESC,
        |        c.cell) AS rk
        |    FROM e CROSS JOIN cents c
        |  ) WHERE rk = 1
        |), q AS (
        |  SELECT vec_id AS q_id, v AS q_vec FROM e JOIN qsel USING (vec_id)
        |), probed AS (
        |  SELECT q_id, cell FROM (
        |    SELECT q.q_id, c.cell,
        |      row_number() OVER (PARTITION BY q.q_id ORDER BY
        |        round(list_inner_product(q.q_vec, c.centroid)
        |          / (sqrt(list_inner_product(q.q_vec, q.q_vec))
        |             * sqrt(list_inner_product(c.centroid, c.centroid))), 6) DESC,
        |        c.cell) AS crk
        |    FROM q CROSS JOIN cents c
        |  ) WHERE crk <= ${Ann.DefaultNProbe}
        |), score AS (
        |  SELECT p.q_id, c.vec_id AS cand_id,
        |    CAST(list_sum(list_transform(range(1, len(qc.cl) + 1),
        |      i -> w.w[i::INT] * (qc.cl[i::INT] - c.cl[i::INT])
        |                       * (qc.cl[i::INT] - c.cl[i::INT])))
        |      AS BIGINT) AS d2_units
        |  FROM probed p
        |  JOIN assign a ON a.cell = p.cell
        |  JOIN codes c ON c.vec_id = a.vec_id
        |  JOIN codes qc ON qc.vec_id = p.q_id
        |  CROSS JOIN wl w
        |  WHERE c.vec_id <> p.q_id
        |)
        |SELECT q_id, rank, cand_id, d2_units FROM (
        |  SELECT q_id, cand_id, d2_units,
        |    row_number() OVER (PARTITION BY q_id
        |      ORDER BY d2_units, cand_id) AS rank
        |  FROM score
        |) WHERE rank <= ${Ann.DefaultTopK}
        |ORDER BY q_id, rank""".stripMargin

  private val truncSql: String =
      s"""WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |), qsel AS (
        |  SELECT vec_id FROM e WHERE vec_id % 25 = 0
        |  ORDER BY (vec_id * 1000003) % 999983, vec_id
        |  LIMIT ${Ann.DefaultMaxQueries}
        |), q AS (
        |  SELECT e.vec_id AS q_id, e.v AS qv
        |  FROM e JOIN qsel ON qsel.vec_id = e.vec_id
        |), pc AS (
        |  SELECT q.q_id, e.vec_id AS cand_id,
        |    round(list_inner_product(q.qv[1:${Ann.DefaultPrefixDims}], e.v[1:${Ann.DefaultPrefixDims}])
        |      / (sqrt(list_inner_product(q.qv[1:${Ann.DefaultPrefixDims}], q.qv[1:${Ann.DefaultPrefixDims}]))
        |         * sqrt(list_inner_product(e.v[1:${Ann.DefaultPrefixDims}], e.v[1:${Ann.DefaultPrefixDims}]))), 6) AS psim
        |  FROM q CROSS JOIN e WHERE e.vec_id <> q.q_id
        |), coarse AS (
        |  SELECT q_id, cand_id FROM (
        |    SELECT q_id, cand_id, row_number() OVER (PARTITION BY q_id
        |      ORDER BY psim DESC, cand_id) AS crk
        |    FROM pc
        |  ) WHERE crk <= ${Ann.DefaultRerankCandidates}
        |), rr AS (
        |  SELECT c.q_id, c.cand_id,
        |    round(list_inner_product(q.qv, e.v)
        |      / (sqrt(list_inner_product(q.qv, q.qv))
        |         * sqrt(list_inner_product(e.v, e.v))), 6) AS sim
        |  FROM coarse c JOIN q ON q.q_id = c.q_id
        |  JOIN e ON e.vec_id = c.cand_id
        |)
        |SELECT q_id, rank, cand_id, sim FROM (
        |  SELECT q_id, cand_id, sim,
        |    row_number() OVER (PARTITION BY q_id
        |      ORDER BY sim DESC, cand_id) AS rank
        |  FROM rr
        |) WHERE rank <= ${Ann.DefaultTopK}
        |ORDER BY q_id, rank""".stripMargin

  /** qe19's composed oracle: the FULL qe11 SQ8 mirror re-run verbatim
    * as a subquery (the advisorSql embedding pattern), graded by the
    * label join, discounted by integer micro-weights computed in-SQL
    * from the same closed form the engine bakes as literals, and
    * reduced per query with exact integer sums and floor-divisions. */
  private def ndcgSql: String = {
    val k = Ann.DefaultTopK
    s"""WITH sq AS (
       |  SELECT q_id, rank, cand_id FROM (
       |$sqSql
       |  )
       |), lab AS (
       |  SELECT vec_id, label FROM embeddings
       |), lc AS (
       |  SELECT label, count(*)::BIGINT AS n FROM lab GROUP BY 1
       |), wt AS (
       |  SELECT i AS rank,
       |    CAST(round(1000000 * ln(2.0) / ln(i + 1.0)) AS BIGINT) AS w
       |  FROM unnest(range(1, $k + 1)) r(i)
       |), cw AS (
       |  SELECT rank, sum(w) OVER (ORDER BY rank)::BIGINT AS cum FROM wt
       |), rel AS (
       |  SELECT s.q_id, ql.label AS q_label, s.rank,
       |    CASE WHEN cl.label = ql.label THEN 1 ELSE 0 END AS rel
       |  FROM sq s
       |  JOIN lab ql ON ql.vec_id = s.q_id
       |  JOIN lab cl ON cl.vec_id = s.cand_id
       |), perq AS (
       |  SELECT r.q_id, r.q_label,
       |    sum(r.rel * wt.w)::BIGINT AS dcg_micro,
       |    min(CASE WHEN r.rel = 1 THEN r.rank END) AS first_rel
       |  FROM rel r JOIN wt ON wt.rank = r.rank
       |  GROUP BY 1, 2
       |), graded AS (
       |  SELECT p.q_id, (lc.n - 1)::BIGINT AS n_rel, p.dcg_micro,
       |    CASE WHEN lc.n - 1 >= 1
       |      THEN (SELECT cum FROM cw WHERE rank = least($k, lc.n - 1))
       |      ELSE 0 END AS idcg_micro,
       |    p.first_rel
       |  FROM perq p JOIN lc ON lc.label = p.q_label
       |)
       |SELECT q_id, n_rel, dcg_micro,
       |  CASE WHEN idcg_micro > 0
       |    THEN (dcg_micro * 1000000) // idcg_micro END AS ndcg_micro,
       |  coalesce(1000000 // first_rel, 0)::BIGINT AS rr_micro
       |FROM graded
       |ORDER BY q_id""".stripMargin
  }

  /** qe14's composed oracle: exact capped ground truth + every
    * compression method's FULL SQL mirror re-run verbatim as a
    * subquery, hit counts joined per method, integer recall micro. */
  private def advisorSql: String = {
    val methods = Seq(
      "ivf_sq8" -> ivfSqSql,
      "pq" -> pqSql, "residual_pq" -> resPqSql,
      "sq8" -> sqSql, "truncated_rerank" -> truncSql)
    val union = methods.map { case (n, body) =>
      s"SELECT '$n' AS method, q_id, cand_id FROM (\n$body\n)"
    }.mkString("\nUNION ALL\n")
    s"""WITH exact AS (
       |  SELECT q_id, cand_id FROM (
       |    WITH e AS (
       |      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |    ), qsel AS (
       |      SELECT vec_id FROM e WHERE vec_id % 25 = 0
       |      ORDER BY (vec_id * 1000003) % 999983, vec_id LIMIT 1024
       |    ), q AS (
       |      SELECT e.vec_id AS q_id, e.v AS qv
       |      FROM e JOIN qsel ON qsel.vec_id = e.vec_id
       |    )
       |    SELECT q_id, cand_id FROM (
       |      SELECT q.q_id, e.vec_id AS cand_id,
       |        row_number() OVER (PARTITION BY q.q_id ORDER BY
       |          round(list_inner_product(q.qv, e.v)
       |            / (sqrt(list_inner_product(q.qv, q.qv))
       |               * sqrt(list_inner_product(e.v, e.v))), 6) DESC,
       |          e.vec_id) AS rk
       |      FROM q CROSS JOIN e WHERE e.vec_id <> q.q_id
       |    ) WHERE rk <= 5
       |  )
       |), m AS (
       |$union
       |), h AS (
       |  SELECT m.method, count(*)::BIGINT AS hits
       |  FROM m JOIN exact USING (q_id, cand_id) GROUP BY 1
       |), nq AS (
       |  SELECT count(DISTINCT q_id)::BIGINT AS n FROM exact
       |), names AS (
       |  SELECT unnest(['ivf_sq8', 'pq', 'residual_pq', 'sq8',
       |                 'truncated_rerank']) AS method
       |)
       |SELECT names.method, nq.n AS n_queries,
       |  coalesce(h.hits, 0)::BIGINT AS hits,
       |  (coalesce(h.hits, 0) * 1000000) // (nq.n * 5) AS recall_micro
       |FROM names CROSS JOIN nq LEFT JOIN h ON h.method = names.method
       |ORDER BY names.method""".stripMargin
  }

  /** The qm4 dHash CTE chain (i → g → b → h: media rows → closed-form
    * grayscale grid → horizontal-gradient bits → 64-bit hash string),
    * factored so the composed qm6 oracle reuses the hash computation
    * VERBATIM — the two keys can never drift apart on the hash. */
  private val phashCoreSql: String =
      """i AS (
        |  SELECT doc_id, text, n_chars FROM documents
        |  WHERE doc_id % 3 = 0 AND n_chars >= 3
        |), g AS (
        |  SELECT doc_id, y, x,
        |    (299 * ascii(substr(text, o + 1, 1))
        |     + 587 * ascii(substr(text, o + 2, 1))
        |     + 114 * ascii(substr(text, o + 3, 1))) // 1000 AS gv
        |  FROM (
        |    SELECT doc_id, text, (c.i // 9)::INT AS y, (c.i % 9)::INT AS x,
        |      ((c.i * 3) % greatest(n_chars - 2, 1))::INT AS o
        |    FROM i CROSS JOIN unnest(range(0, 72)) c(i)
        |  )
        |), b AS (
        |  SELECT a.doc_id, a.y, a.x,
        |    CASE WHEN n.gv > a.gv THEN '1' ELSE '0' END AS bit
        |  FROM g a JOIN g n ON n.doc_id = a.doc_id AND n.y = a.y
        |    AND n.x = a.x + 1
        |  WHERE a.x < 8
        |), h AS (
        |  SELECT doc_id AS media_id,
        |    string_agg(bit, '' ORDER BY y, x) AS dhash
        |  FROM b GROUP BY doc_id
        |)""".stripMargin

  /** qm4/qs24 shared oracle (one SQL text serves both keys). */
  private val phashSql: String =
      s"""WITH $phashCoreSql
        |SELECT media_id, dhash,
        |  min(media_id) OVER (PARTITION BY dhash) AS dup_rep,
        |  media_id <> min(media_id) OVER (PARTITION BY dhash) AS is_dup
        |FROM h ORDER BY media_id""".stripMargin

  /** Generated coarse-centroid Lloyd-refinement CTE chain (qe10's
    * residual family — `Ann.refinedCentroids`): step t re-assigns every
    * vector of `e` to its nearest centroid of the previous generation
    * (6dp-rounded cosine DESC, ties to the lowest cell — the family
    * argmax) and rebuilds centroids as assigned means, an empty cell
    * keeping its previous centroid through the LEFT JOIN + coalesce.
    * Consumers read `ccents$$iters`. */
  private def centRefineChainSql(iters: Int): String =
    (1 to iters).map { t =>
      val prev = if (t == 1) "cents" else s"ccents${t - 1}"
      s"""casg$t AS MATERIALIZED (
         |  SELECT vec_id, cell, v FROM (
         |    SELECT e.vec_id, c.cell, e.v,
         |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |        round(list_inner_product(e.v, c.centroid)
         |          / (sqrt(list_inner_product(e.v, e.v))
         |             * sqrt(list_inner_product(c.centroid, c.centroid))), 6) DESC,
         |        c.cell) AS rk
         |    FROM e CROSS JOIN $prev c
         |  ) WHERE rk = 1
         |), ccents$t AS MATERIALIZED (
         |  SELECT p.cell, coalesce(n.centroid, p.centroid) AS centroid
         |  FROM $prev p LEFT JOIN (
         |    SELECT cell, list(m ORDER BY dim) AS centroid FROM (
         |      SELECT cell, r.i AS dim, avg(v[r.i::INT]) AS m
         |      FROM casg$t CROSS JOIN unnest(range(1, len(v) + 1)) r(i)
         |      GROUP BY 1, 2
         |    ) GROUP BY cell
         |  ) n ON n.cell = p.cell
         |)""".stripMargin
    }.mkString(", ")

  /** Generated Lloyd-refinement CTE chain for a sub-space codebook
    * oracle (shared by the plain and residual PQ mirrors): step t
    * assigns every sub-vector of CTE `sv` to its nearest codeword of
    * the previous generation (6dp-rounded squared L2, ties to the
    * lowest code — the family argmin) and rebuilds codewords as
    * assigned means, a code with no members keeping its previous
    * codeword through the LEFT JOIN + coalesce — exactly
    * `Ann.refineCodebook`. Names are `$${pfx}asg$$t` / `$${pfx}cb$$t`;
    * consumers read `$${pfx}cb$$iters`. */
  private def pqRefineChainSql(sv: String, cb0: String, pfx: String,
                               iters: Int): String =
    (1 to iters).map { t =>
      val prev = if (t == 1) cb0 else s"${pfx}cb${t - 1}"
      s"""${pfx}asg$t AS MATERIALIZED (
         |  SELECT sub, code, x FROM (
         |    SELECT $sv.sub, cb.code, $sv.x,
         |      row_number() OVER (PARTITION BY $sv.vec_id, $sv.sub
         |        ORDER BY round(list_inner_product($sv.x, $sv.x)
         |          - 2 * list_inner_product($sv.x, cb.cw)
         |          + list_inner_product(cb.cw, cb.cw), 6), cb.code) AS rk
         |    FROM $sv JOIN $prev cb ON cb.sub = $sv.sub
         |  ) WHERE rk = 1
         |), ${pfx}cb$t AS MATERIALIZED (
         |  SELECT p.sub, p.code, coalesce(n.cw, p.cw) AS cw
         |  FROM $prev p LEFT JOIN (
         |    SELECT sub, code, list(mv ORDER BY dim) AS cw FROM (
         |      SELECT sub, code, r.i AS dim, avg(x[r.i::INT]) AS mv
         |      FROM ${pfx}asg$t CROSS JOIN unnest(range(1, len(x) + 1)) r(i)
         |      GROUP BY 1, 2, 3
         |    ) GROUP BY sub, code
         |  ) n ON n.sub = p.sub AND n.code = p.code
         |)""".stripMargin
    }.mkString(", ")

  /** qe15's oracle: exact top-c stage (the proven qe12 coarse shape) →
    * candidate micro-cosine pair matrix → k GENERATED greedy MMR step
    * CTEs (the qd36/bpe iteration pattern): step t scores every
    * not-yet-selected candidate λ%·rel − (100−λ%)·max-sim-to-selected
    * in exact integers and picks the per-query argmax (ties to the
    * lowest cand_id); sel0 is the typed empty set so step 1's penalty
    * coalesces to 0 by definition. */
  private def mmrSql(k: Int, c: Int, lambdaPct: Int): String = {
    val mu = 100 - lambdaPct
    val chain = (1 to k).map { t =>
      s"""pick$t AS MATERIALIZED (
         |  SELECT q_id, cand_id, rel_us, score_us FROM (
         |    SELECT s.q_id, s.cand_id, s.rel_us,
         |      ($lambdaPct * s.rel_us - $mu * coalesce(m.mx, 0))::BIGINT
         |        AS score_us,
         |      row_number() OVER (PARTITION BY s.q_id
         |        ORDER BY $lambdaPct * s.rel_us - $mu * coalesce(m.mx, 0) DESC,
         |          s.cand_id) AS rk
         |    FROM s
         |    LEFT JOIN (
         |      SELECT p.q_id, p.cand_a AS cand_id, max(p.sim_us) AS mx
         |      FROM ps p JOIN sel${t - 1} sl
         |        ON sl.q_id = p.q_id AND sl.cand_id = p.cand_b
         |      GROUP BY 1, 2
         |    ) m ON m.q_id = s.q_id AND m.cand_id = s.cand_id
         |    WHERE NOT EXISTS (SELECT 1 FROM sel${t - 1} sl
         |      WHERE sl.q_id = s.q_id AND sl.cand_id = s.cand_id)
         |  ) WHERE rk = 1
         |), sel$t AS MATERIALIZED (
         |  SELECT q_id, cand_id, $t::BIGINT AS step, rel_us, score_us
         |  FROM pick$t
         |  UNION ALL
         |  SELECT q_id, cand_id, step, rel_us, score_us FROM sel${t - 1}
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |), qsel AS (
       |  SELECT vec_id FROM e WHERE vec_id % 25 = 0
       |  ORDER BY (vec_id * 1000003) % 999983, vec_id
       |  LIMIT ${Ann.DefaultMaxQueries}
       |), q AS (
       |  SELECT e.vec_id AS q_id, e.v AS qv
       |  FROM e JOIN qsel ON qsel.vec_id = e.vec_id
       |), pc AS (
       |  SELECT q.q_id, e.vec_id AS cand_id,
       |    round(list_inner_product(q.qv, e.v)
       |      / (sqrt(list_inner_product(q.qv, q.qv))
       |         * sqrt(list_inner_product(e.v, e.v))), 6) AS psim
       |  FROM q CROSS JOIN e WHERE e.vec_id <> q.q_id
       |), s AS MATERIALIZED (
       |  SELECT q_id, cand_id, CAST(round(psim * 1e6) AS BIGINT) AS rel_us
       |  FROM (
       |    SELECT q_id, cand_id, psim, row_number() OVER (PARTITION BY q_id
       |      ORDER BY psim DESC, cand_id) AS crk
       |    FROM pc
       |  ) WHERE crk <= $c
       |), cv AS MATERIALIZED (
       |  SELECT s.q_id, s.cand_id, e.v FROM s JOIN e ON e.vec_id = s.cand_id
       |), ps AS MATERIALIZED (
       |  SELECT a.q_id, a.cand_id AS cand_a, b.cand_id AS cand_b,
       |    CAST(round(round(list_inner_product(a.v, b.v)
       |      / (sqrt(list_inner_product(a.v, a.v))
       |         * sqrt(list_inner_product(b.v, b.v))), 6) * 1e6) AS BIGINT)
       |      AS sim_us
       |  FROM cv a JOIN cv b ON b.q_id = a.q_id AND b.cand_id <> a.cand_id
       |), sel0 AS (
       |  SELECT CAST(NULL AS BIGINT) AS q_id, CAST(NULL AS BIGINT) AS cand_id,
       |    CAST(NULL AS BIGINT) AS step, CAST(NULL AS BIGINT) AS rel_us,
       |    CAST(NULL AS BIGINT) AS score_us WHERE false
       |), $chain
       |SELECT q_id, step, cand_id, rel_us, score_us FROM sel$k
       |ORDER BY q_id, step""".stripMargin
  }

  /** qe18's oracle: the FULL pipeline in SQL — integer-micro second
    * moment (exact HUGEINT sums, cast to double only once summed),
    * `Pca.Iters` GENERATED power-iteration CTEs (the qd36/bpeChainSql
    * iteration-CTE pattern: each step is a matvec via
    * `list_inner_product` + an l2 normalization, float order identical
    * to the engine's sequential driver loop), then the projection. */
  private val pcaPowerSql: String = {
    import graft.similarity.Pca
    // ONE MATERIALIZED CTE per step (matvec + normalize fused):
    // DuckDB's binder inlines plain CTEs, so a 64-step chain exceeds
    // its 128-deep recursion cap — MATERIALIZED pins each step and the
    // chain binds flat (verified: plain CTEs fail at depth 64, the
    // materialized chain runs).
    val iterCtes = (1 to Pca.Iters).map { s =>
      s"""x$s AS MATERIALIZED (
         |  SELECT list_transform(xr,
         |    v -> v / sqrt(list_inner_product(xr, xr))) AS x
         |  FROM (SELECT list(ip ORDER BY i) AS xr FROM (
         |    SELECT i, list_inner_product(row, (SELECT x FROM x${s - 1})) AS ip
         |    FROM crow))
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH e AS (
       |  SELECT vec_id, label,
       |    list_transform(embedding::DOUBLE[],
       |      v -> round(v * ${Pca.Micro})::BIGINT) AS vi
       |  FROM embeddings
       |), cm AS MATERIALIZED (
       |  SELECT i.i, j.j, sum(e.vi[i.i] * e.vi[j.j])::DOUBLE AS c
       |  FROM e
       |  CROSS JOIN (SELECT unnest(range(1, ${Pca.Dim + 1})) AS i) i
       |  CROSS JOIN (SELECT unnest(range(1, ${Pca.Dim + 1})) AS j) j
       |  GROUP BY 1, 2
       |), crow AS MATERIALIZED (
       |  SELECT i, list(c ORDER BY j) AS row FROM cm GROUP BY i
       |), x0 AS MATERIALIZED (
       |  SELECT list_transform(range(1, ${Pca.Dim + 1}),
       |    i -> 1.0 / sqrt(${Pca.Dim}.0)) AS x
       |), $iterCtes
       |SELECT e.vec_id, e.label,
       |  round(list_inner_product(list_transform(vi, v -> v::DOUBLE),
       |    (SELECT x FROM x${Pca.Iters})) / ${Pca.Micro}, 6) AS pc1
       |FROM e
       |ORDER BY vec_id""".stripMargin
  }

  /** qd40/qs28 shared oracle (one SQL text serves both keys): hybrid
    * sparse+dense RRF; the streaming form folds both indices to these
    * inputs across the batch boundary. */
  private val hybridRrfSql: String =
    s"""WITH toks AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
      |  FROM documents
      |), postings AS (
      |  SELECT doc_id, term, count(*)::DOUBLE AS tf
      |  FROM toks WHERE term IN ('spark', 'query', 'window')
      |  GROUP BY doc_id, term
      |), dl AS (
      |  SELECT doc_id,
      |    len(string_split_regex(trim(text), '\\s+'))::DOUBLE AS dl
      |  FROM documents
      |), stats AS (
      |  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
      |    (SELECT avg(dl) FROM dl) AS avgdl
      |), idf AS (
      |  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM postings
      |  GROUP BY term
      |), scored AS (
      |  SELECT p.doc_id,
      |    round(sum(ln((s.n - i.df + 0.5) / (i.df + 0.5) + 1.0)
      |      * (p.tf * 2.2)
      |      / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * d.dl / s.avgdl))), 6) AS score
      |  FROM postings p
      |  CROSS JOIN stats s
      |  JOIN idf i ON p.term = i.term
      |  JOIN dl d ON p.doc_id = d.doc_id
      |  GROUP BY p.doc_id
      |), sparse AS (
      |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id)
      |    AS sparse_rank
      |  FROM (SELECT doc_id, score FROM scored
      |        ORDER BY score DESC, doc_id LIMIT ${graft.text.Search.HybridCandK})
      |), dtf AS (
      |  SELECT doc_id,
      |    (md5_number_lower('htf:' || term) % ${graft.text.Search.HtfBuckets})::INT AS bucket,
      |    count(*)::DOUBLE AS tf
      |  FROM toks GROUP BY 1, 2
      |), dnorm AS (
      |  SELECT doc_id, sqrt(sum(tf * tf)) AS dnorm FROM dtf GROUP BY 1
      |), qt AS (
      |  SELECT (md5_number_lower('htf:' || term) % ${graft.text.Search.HtfBuckets})::INT AS bucket,
      |    count(*)::DOUBLE AS qtf
      |  FROM (VALUES ('spark'), ('query'), ('window')) q(term) GROUP BY 1
      |), qn AS (
      |  SELECT sqrt(sum(qtf * qtf)) AS qnorm FROM qt
      |), dense AS (
      |  SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id)
      |    AS dense_rank
      |  FROM (
      |    SELECT t.doc_id,
      |      round(t.dot / (n.dnorm * (SELECT qnorm FROM qn)), 6) AS cos
      |    FROM (
      |      SELECT d.doc_id, sum(d.tf * q.qtf) AS dot
      |      FROM dtf d JOIN qt q ON d.bucket = q.bucket GROUP BY 1
      |    ) t JOIN dnorm n ON t.doc_id = n.doc_id
      |    ORDER BY cos DESC, t.doc_id LIMIT ${graft.text.Search.HybridCandK}
      |  )
      |), fused AS (
      |  SELECT coalesce(s.doc_id, d.doc_id) AS doc_id,
      |    s.sparse_rank, d.dense_rank,
      |    round(coalesce(1.0 / (${graft.text.Search.RrfK} + s.sparse_rank), 0.0)
      |        + coalesce(1.0 / (${graft.text.Search.RrfK} + d.dense_rank), 0.0), 6)
      |      AS rrf_score
      |  FROM sparse s FULL OUTER JOIN dense d ON s.doc_id = d.doc_id
      |)
      |SELECT row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS rank,
      |  doc_id, rrf_score, sparse_rank, dense_rank
      |FROM (SELECT * FROM fused ORDER BY rrf_score DESC, doc_id LIMIT 10)
      |ORDER BY rank""".stripMargin

  /** qm7/qs34 shared oracle (one SQL text serves both keys): the
    * synthesized ISO-BMFF containers' parameters are pure integer
    * functions of the document row, so the oracle recomputes them in
    * closed form — the hash matches only when the engine's recursive
    * box walk (version-aware mvhd offsets, stsd entry walk, computed
    * nested sizes) is byte-faithful. container_bytes is the exact
    * writer layout: fixed boxes (221 with the 2-track v0 moov on even
    * ids, 167 with the 1-track v1 moov on odd) + the document's UTF-8
    * bytes riding in the opaque skip box. */
  private val mp4MetadataSql: String =
    """SELECT doc_id AS media_id,
      |  'isom' AS brand,
      |  90000::BIGINT AS timescale,
      |  (n_chars * 900)::BIGINT AS duration_units,
      |  (n_chars * 10)::BIGINT AS duration_ms,
      |  (2 - doc_id % 2)::BIGINT AS n_tracks,
      |  concat(CASE WHEN (doc_id // 2) % 2 = 0 THEN 'avc1' ELSE 'hvc1' END,
      |         CASE WHEN doc_id % 2 = 0 THEN ' mp4a' ELSE '' END) AS codecs,
      |  (CASE WHEN doc_id % 2 = 0 THEN 221 ELSE 167 END
      |   + octet_length(encode(text)))::BIGINT AS container_bytes
      |FROM documents WHERE doc_id % 3 = 1
      |ORDER BY media_id""".stripMargin

  /** qm8/qs35 shared oracle (one SQL text serves both keys). */
  private val mp3AdtsSql: String =
    """WITH a AS (
        |  SELECT doc_id,
        |    octet_length(encode(text)) AS tb,
        |    CASE ((doc_id // 2) % 3) WHEN 0 THEN 44100
        |         WHEN 1 THEN 48000 ELSE 32000 END AS sr,
        |    CASE ((doc_id // 2) % 4) WHEN 0 THEN 128 WHEN 1 THEN 192
        |         WHEN 2 THEN 320 ELSE 64 END AS br,
        |    3 + doc_id % 5 AS nf
        |  FROM documents WHERE doc_id % 3 = 2)
        |SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'mp3' ELSE 'adts' END AS container,
        |  sr::BIGINT AS sample_rate,
        |  (CASE WHEN doc_id % 2 = 0 THEN br ELSE 0 END)::BIGINT AS bitrate_kbps,
        |  nf::BIGINT AS n_frames,
        |  (CASE WHEN doc_id % 2 = 0 THEN nf * 1152 * 1000 // sr
        |        ELSE nf * 1024 * 1000 // sr END)::BIGINT AS duration_ms,
        |  (CASE WHEN doc_id % 2 = 0
        |        THEN 10 + tb + nf * (144000 * br // sr) + nf // 2
        |        ELSE nf * (8 + doc_id % 7) END)::BIGINT AS stream_bytes
        |FROM a ORDER BY media_id""".stripMargin

  /** qm5/qs30 shared oracle (one SQL text serves both keys). */
  private val audioFeaturesSql: String =
    """WITH a AS (
      |  SELECT doc_id, text, n_chars,
      |    (64 + 16 * (doc_id % 5))::BIGINT AS n
      |  FROM documents WHERE doc_id % 3 = 2 AND n_chars >= 1
      |), s AS (
      |  SELECT doc_id, n, r.i,
      |    ((ascii(substr(text, (r.i % greatest(n_chars, 1))::INT + 1, 1)) - 96)
      |      * 256)::BIGINT AS s
      |  FROM a CROSS JOIN unnest(range(0, n)) r(i)
      |), w AS (
      |  SELECT doc_id, n, i, s,
      |    lag(s) OVER (PARTITION BY doc_id ORDER BY i) AS prev
      |  FROM s
      |), f AS (
      |  SELECT doc_id, n,
      |    max(abs(s))::BIGINT AS peak,
      |    sum(abs(s))::BIGINT AS sum_abs,
      |    sum(CASE WHEN i > 0 AND ((prev >= 0) <> (s >= 0))
      |        THEN 1 ELSE 0 END)::BIGINT AS zc
      |  FROM w GROUP BY doc_id, n
      |)
      |SELECT doc_id AS media_id, 8000::BIGINT AS sample_rate,
      |  n AS n_samples, peak, sum_abs, zc AS zero_crossings
      |FROM f ORDER BY media_id""".stripMargin

  /** qe21/qs31 shared oracle (one SQL text serves both keys): integer
    * component sums per arrival window, TRUNCATED integer-division
    * micro means (Spark `div` truncates toward zero; DuckDB's `//`
    * floors, so negative sums mirror the truncation explicitly), and
    * the long-safe squared displacement vs the lifetime mean. */
  private val embDriftSql: String = {
    import graft.similarity.Pca
    s"""WITH e AS (
       |  SELECT vec_id,
       |    list_transform(embedding::DOUBLE[],
       |      v -> round(v * ${Pca.Micro})::BIGINT) AS vi
       |  FROM embeddings
       |), sums AS (
       |  SELECT (vec_id // ${Pca.DriftSpan})::BIGINT AS w,
       |    (r.i - 1)::INT AS i,
       |    sum(vi[r.i::INT])::BIGINT AS s, count(*)::BIGINT AS n
       |  FROM e CROSS JOIN unnest(range(1, ${Pca.Dim + 1})) r(i)
       |  GROUP BY 1, 2
       |), life AS (
       |  SELECT i, sum(s)::BIGINT AS ls, sum(n)::BIGINT AS ln
       |  FROM sums GROUP BY 1
       |), d AS (
       |  SELECT s.w, s.n,
       |    (CASE WHEN s.s < 0 THEN -((-s.s) // s.n) ELSE s.s // s.n END
       |     - CASE WHEN l.ls < 0 THEN -((-l.ls) // l.ln)
       |            ELSE l.ls // l.ln END)::BIGINT AS dm
       |  FROM sums s JOIN life l USING (i)
       |)
       |SELECT w, max(n)::BIGINT AS n_vecs,
       |  sum(dm * dm)::BIGINT AS d2_units,
       |  sum(dm * dm) > ${Pca.DriftD2Alarm} AS alarm
       |FROM d GROUP BY w
       |ORDER BY w""".stripMargin
  }

  /** qd42/qs32 shared oracle (one SQL text serves both keys). */

  /** qm19's oracle: qm17's luma chain (Hadamard → rounded dequant →
    * flat residual → prediction recursion) PLUS the chroma half — the
    * 2×2 Hadamard as conditional sums, the §8.5.11 << qPc/6 >> 5 scale
    * as explicit floor division, and the per-plane §8.3.4 DC
    * prediction recursion down the macroblock column (every block
    * predicts from the MB-top edge, so the carried state is the two
    * bottom-block values per plane). total_coeff spans BOTH residual
    * families, so the chroma CAVLC layer (the nC = −1 context) has no
    * oracle shortcut. */
  private val chromaDecodeSql: String = {
    def fdiv(x: String, d: Int): String =
      s"(($x) - ((($x) % $d) + $d) % $d) // $d"
    def clip(x: String): String = s"greatest(0, least(255, $x))"
    s"""WITH RECURSIVE a AS (
  SELECT doc_id, (1 + doc_id % 4)::BIGINT AS n_mbs,
         (20 + doc_id % 10)::BIGINT AS qp
  FROM documents WHERE doc_id % 3 = 1
), cz AS (
  SELECT a.doc_id, a.n_mbs, a.qp, m.m, z.z,
    (CASE WHEN ((a.doc_id + 5*(16*m.m + z.z)) % 11) < 4 THEN 0
          ELSE ((a.doc_id + 5*(16*m.m + z.z)) % 11) - 7 END)::BIGINT AS c
  FROM a
  CROSS JOIN unnest(range(0, a.n_mbs)) m(m)
  CROSS JOIN unnest(range(0, 16)) z(z)
), fh AS (
  SELECT cz.doc_id, cz.n_mbs, cz.qp, cz.m, g.r, g.cc,
    sum(cz.c
      * ([1,1,1,1, 1,1,-1,-1, 1,-1,-1,1, 1,-1,1,-1])
          [g.r*4 + ([0,1,4,8,5,2,3,6,9,12,13,10,7,11,14,15])[cz.z+1] // 4 + 1]
      * ([1,1,1,1, 1,1,-1,-1, 1,-1,-1,1, 1,-1,1,-1])
          [g.cc*4 + ([0,1,4,8,5,2,3,6,9,12,13,10,7,11,14,15])[cz.z+1] % 4 + 1]
    )::BIGINT AS f
  FROM cz CROSS JOIN (
    SELECT r.r, cc.cc
    FROM unnest(range(0, 4)) r(r) CROSS JOIN unnest(range(0, 4)) cc(cc)
  ) g
  GROUP BY cz.doc_id, cz.n_mbs, cz.qp, cz.m, g.r, g.cc
), d AS (
  SELECT doc_id, n_mbs, qp, m, r, cc,
    ${fdiv("(num - ((num % den) + den) % den) // den + 32", 64)} AS res
  FROM (
    SELECT doc_id, n_mbs, qp, m, r, cc,
      f * ([160,176,208,224,256,288])[qp % 6 + 1]
        + CASE WHEN qp >= 24 THEN 2 ELSE 4 END AS num,
      CASE WHEN qp >= 24 THEN 4 ELSE 8 END AS den
    FROM fh
  ) x
), b AS (
  SELECT doc_id, m,
    max(CASE WHEN cc = 0 THEN res END) AS r0,
    max(CASE WHEN cc = 1 THEN res END) AS r1,
    max(CASE WHEN cc = 2 THEN res END) AS r2,
    max(CASE WHEN cc = 3 THEN res END) AS r3
  FROM d WHERE r = 3 GROUP BY doc_id, m
), p AS (
  SELECT doc_id, 0::BIGINT AS m, 128::BIGINT AS pred, n_mbs FROM a
  UNION ALL
  SELECT p.doc_id, p.m + 1,
    ((4*( ${clip("p.pred + b.r0")} + ${clip("p.pred + b.r1")}
        + ${clip("p.pred + b.r2")} + ${clip("p.pred + b.r3")} ) + 8) // 16)
      ::BIGINT,
    p.n_mbs
  FROM p JOIN b ON b.doc_id = p.doc_id AND b.m = p.m
  WHERE p.m + 1 < p.n_mbs
), lsum AS (
  SELECT d.doc_id,
    sum(16 * ${clip("p.pred + d.res")})::BIGINT AS luma_sum
  FROM d JOIN p ON p.doc_id = d.doc_id AND p.m = d.m
  GROUP BY d.doc_id
), cac AS (
  SELECT a.doc_id, a.n_mbs, a.qp, m.m, pp.p, z.z,
    (CASE WHEN ((a.doc_id + 3*m.m + 7*pp.p + 5*z.z) % 9) < 3 THEN 0
          ELSE ((a.doc_id + 3*m.m + 7*pp.p + 5*z.z) % 9) - 6 END)::BIGINT AS c
  FROM a
  CROSS JOIN unnest(range(0, a.n_mbs)) m(m)
  CROSS JOIN unnest(range(0, 2)) pp(p)
  CROSS JOIN unnest(range(0, 4)) z(z)
), cf AS (
  SELECT cac.doc_id, cac.n_mbs, cac.qp, cac.m, cac.p, k.k,
    sum(cac.c * ([1,1,1,1, 1,-1,1,-1, 1,1,-1,-1, 1,-1,-1,1])
                  [k.k*4 + cac.z + 1])::BIGINT AS f
  FROM cac CROSS JOIN unnest(range(0, 4)) k(k)
  GROUP BY cac.doc_id, cac.n_mbs, cac.qp, cac.m, cac.p, k.k
), cd AS (
  SELECT doc_id, n_mbs, qp, m, p, k,
    ${fdiv(fdiv("x", 32) + " + 32", 64)} AS res
  FROM (
    SELECT doc_id, n_mbs, qp, m, p, k,
      f * ([160,176,208,224,256,288])[qp % 6 + 1]
        * (CASE WHEN qp >= 24 THEN 16 ELSE 8 END) AS x
    FROM cf
  ) y
), cg AS (
  SELECT doc_id, n_mbs, qp, m, p,
    max(CASE WHEN k = 0 THEN res END) AS r00,
    max(CASE WHEN k = 1 THEN res END) AS r10,
    max(CASE WHEN k = 2 THEN res END) AS r01,
    max(CASE WHEN k = 3 THEN res END) AS r11
  FROM cd GROUP BY doc_id, n_mbs, qp, m, p
), cpr AS (
  SELECT doc_id, p, m,
    ${clip("128 + r00")}::BIGINT AS v00, ${clip("128 + r10")}::BIGINT AS v10,
    ${clip("128 + r01")}::BIGINT AS v01, ${clip("128 + r11")}::BIGINT AS v11,
    n_mbs
  FROM cg WHERE m = 0
  UNION ALL
  SELECT c.doc_id, c.p, cg.m,
    ${clip("c.v01 + cg.r00")}::BIGINT, ${clip("c.v11 + cg.r10")}::BIGINT,
    ${clip("c.v01 + cg.r01")}::BIGINT, ${clip("c.v11 + cg.r11")}::BIGINT,
    c.n_mbs
  FROM cpr c JOIN cg ON cg.doc_id = c.doc_id AND cg.p = c.p
    AND cg.m = c.m + 1
  WHERE c.m + 1 < c.n_mbs
), cpx AS (
  SELECT cpr.doc_id, cpr.p, cpr.m, g.cbx, g.cby,
    CASE WHEN g.cbx = 0 AND g.cby = 0 THEN cpr.v00
         WHEN g.cbx = 1 AND g.cby = 0 THEN cpr.v10
         WHEN g.cbx = 0 AND g.cby = 1 THEN cpr.v01
         ELSE cpr.v11 END AS v
  FROM cpr CROSS JOIN (
    SELECT x.cbx, y.cby
    FROM unnest(range(0, 2)) x(cbx) CROSS JOIN unnest(range(0, 2)) y(cby)
  ) g
), cw AS (
  SELECT cpx.doc_id, cpx.p, cpx.m, cpx.cbx, cpx.cby, cpx.v,
    sum((((cpx.m*8 + cpx.cby*4 + rw.rw) * 8 + cpx.cbx*4 + cl.cl) % 97) + 1)
      ::BIGINT AS wsum
  FROM cpx
  CROSS JOIN unnest(range(0, 4)) rw(rw)
  CROSS JOIN unnest(range(0, 4)) cl(cl)
  GROUP BY cpx.doc_id, cpx.p, cpx.m, cpx.cbx, cpx.cby, cpx.v
), cagg AS (
  SELECT doc_id,
    sum(CASE WHEN p = 0 THEN 16*v ELSE 0 END)::BIGINT AS cb_sum,
    sum(CASE WHEN p = 1 THEN 16*v ELSE 0 END)::BIGINT AS cr_sum,
    sum(CASE WHEN p = 0 THEN v*wsum ELSE 0 END)::BIGINT AS cb_checksum,
    sum(CASE WHEN p = 1 THEN v*wsum ELSE 0 END)::BIGINT AS cr_checksum
  FROM cw GROUP BY doc_id
), tcn AS (
  SELECT z1.doc_id, (z1.t + z2.t)::BIGINT AS total_coeff
  FROM (SELECT doc_id, count(*) FILTER (c <> 0) AS t FROM cz GROUP BY doc_id) z1
  JOIN (SELECT doc_id, count(*) FILTER (c <> 0) AS t FROM cac GROUP BY doc_id) z2
    ON z2.doc_id = z1.doc_id
)
SELECT a.doc_id AS media_id, a.n_mbs, a.qp, tcn.total_coeff,
  lsum.luma_sum, cagg.cb_sum, cagg.cr_sum,
  cagg.cb_checksum, cagg.cr_checksum
FROM a
JOIN tcn ON tcn.doc_id = a.doc_id
JOIN lsum ON lsum.doc_id = a.doc_id
JOIN cagg ON cagg.doc_id = a.doc_id
ORDER BY media_id"""
  }

  /** qd43/qs36 shared oracle — see the map-entry comment. */
  /** qm18's oracle, built programmatically: the §8.5.12.2 inverse core
    * transform is 16 g-expressions (horizontal butterfly) + 16 pixel
    * expressions (vertical butterfly + (·+32)>>6), with every >>1 and
    * >>6 spelled out as explicit floor division (DuckDB `//` truncates
    * toward zero) — generated by loops so each of the 32 expressions is
    * the literal spec recurrence, not a hand-expanded approximation. */
  private val acDecodeSql: String = {
    def fdiv(x: String, d: Int): String =
      s"(($x) - ((($x) % $d) + $d) % $d) // $d"
    val gExprs = (0 until 4).flatMap { i =>
      val (d0, d1, d2, d3) =
        (s"d${4 * i}", s"d${4 * i + 1}", s"d${4 * i + 2}", s"d${4 * i + 3}")
      val e0 = s"($d0 + $d2)"
      val e1 = s"($d0 - $d2)"
      val e2 = s"(${fdiv(d1, 2)} - $d3)"
      val e3 = s"($d1 + ${fdiv(d3, 2)})"
      Seq(s"$e0 + $e3 AS g${4 * i}", s"$e1 + $e2 AS g${4 * i + 1}",
        s"$e1 - $e2 AS g${4 * i + 2}", s"$e0 - $e3 AS g${4 * i + 3}")
    }.mkString(",\n    ")
    val veExprs = (0 until 4).flatMap { j =>
      Seq(
        s"g$j + g${8 + j} AS ve0_$j",
        s"g$j - g${8 + j} AS ve1_$j",
        s"${fdiv(s"g${4 + j}", 2)} - g${12 + j} AS ve2_$j",
        s"g${4 + j} + ${fdiv(s"g${12 + j}", 2)} AS ve3_$j")
    }.mkString(",\n    ")
    val pxExprs = (0 until 4).flatMap { j =>
      Seq(
        s"${fdiv(s"ve0_$j + ve3_$j + 32", 64)} AS px$j",
        s"${fdiv(s"ve1_$j + ve2_$j + 32", 64)} AS px${4 + j}",
        s"${fdiv(s"ve1_$j - ve2_$j + 32", 64)} AS px${8 + j}",
        s"${fdiv(s"ve0_$j - ve3_$j + 32", 64)} AS px${12 + j}")
    }.mkString(",\n    ")
    val dExprs = (1 until 16).map(k =>
      s"CASE WHEN p = $k THEN dac ELSE 0 END AS d$k").mkString(",\n    ")
    // bottom-row pixels: blocks (bx, by=3) are luma4x4BlkIdx 10/11/14/15,
    // their pixel rows 3 are px12..px15
    val botBlk = Seq(10, 11, 14, 15)
    val botExprs = (0 until 16).map { x =>
      s"max(CASE WHEN b = ${botBlk(x / 4)} THEN px${12 + x % 4} END) AS bp$x"
    }.mkString(",\n    ")
    val predSum = (0 until 16)
      .map(x => s"greatest(0, least(255, pr.pred + bot.bp$x))")
      .mkString(" + ")
    val pxList = (0 until 16).map(k => s"px$k").mkString(", ")
    s"""WITH RECURSIVE a AS (
  SELECT doc_id, (1 + doc_id % 4)::BIGINT AS n_mbs,
         (20 + doc_id % 10)::BIGINT AS qp
  FROM documents WHERE doc_id % 3 = 1
), cz AS (
  SELECT a.doc_id, a.n_mbs, a.qp, m.m, z.z,
    (CASE WHEN ((a.doc_id + 5*(16*m.m + z.z)) % 11) < 4 THEN 0
          ELSE ((a.doc_id + 5*(16*m.m + z.z)) % 11) - 7 END)::BIGINT AS c
  FROM a
  CROSS JOIN unnest(range(0, a.n_mbs)) m(m)
  CROSS JOIN unnest(range(0, 16)) z(z)
), fh AS (
  SELECT cz.doc_id, cz.n_mbs, cz.qp, cz.m, g.r, g.cc,
    sum(cz.c
      * ([1,1,1,1, 1,1,-1,-1, 1,-1,-1,1, 1,-1,1,-1])
          [g.r*4 + ([0,1,4,8,5,2,3,6,9,12,13,10,7,11,14,15])[cz.z+1] // 4 + 1]
      * ([1,1,1,1, 1,1,-1,-1, 1,-1,-1,1, 1,-1,1,-1])
          [g.cc*4 + ([0,1,4,8,5,2,3,6,9,12,13,10,7,11,14,15])[cz.z+1] % 4 + 1]
    )::BIGINT AS f
  FROM cz CROSS JOIN (
    SELECT r.r, cc.cc
    FROM unnest(range(0, 4)) r(r) CROSS JOIN unnest(range(0, 4)) cc(cc)
  ) g
  GROUP BY cz.doc_id, cz.n_mbs, cz.qp, cz.m, g.r, g.cc
), dd AS (
  SELECT doc_id, n_mbs, qp, m, r AS by, cc AS bx,
    (num - ((num % den) + den) % den) // den AS dc
  FROM (
    SELECT doc_id, n_mbs, qp, m, r, cc,
      f * ([160,176,208,224,256,288])[qp % 6 + 1]
        + CASE WHEN qp >= 24 THEN 2 ELSE 4 END AS num,
      CASE WHEN qp >= 24 THEN 4 ELSE 8 END AS den
    FROM fh
  ) x
), acm AS (
  SELECT a.doc_id, a.n_mbs, a.qp, m.m, b.b,
    CASE WHEN (a.doc_id + m.m + b.b) % 3 = 0 THEN 0
         ELSE ([0,1,4,8,5,2,3,6,9,12,13,10,7,11,14,15])
                [1 + ((a.doc_id + 7*m.m + 3*b.b) % 15) + 1] END AS p,
    ([-2,-1,1,2])[((a.doc_id + 5*m.m + 11*b.b) % 4) + 1] AS aval
  FROM a
  CROSS JOIN unnest(range(0, a.n_mbs)) m(m)
  CROSS JOIN unnest(range(0, 16)) b(b)
), dcols AS (
  SELECT acm.doc_id, acm.n_mbs, acm.qp, acm.m, acm.b,
    2*((acm.b // 4) % 2) + acm.b % 2 AS bx,
    2*(acm.b // 8) + (acm.b // 2) % 2 AS by,
    dd.dc AS d0,
    $dExprs
  FROM (
    SELECT acm.*,
      CASE WHEN acm.p = 0 THEN 0 ELSE acm.aval *
        ([10,16,13, 11,18,14, 13,20,16, 14,23,18, 16,25,20, 18,29,23])
          [(acm.qp % 6) * 3
           + (CASE WHEN (acm.p // 4) % 2 = 0 AND (acm.p % 4) % 2 = 0 THEN 0
                   WHEN (acm.p // 4) % 2 = 1 AND (acm.p % 4) % 2 = 1 THEN 1
                   ELSE 2 END) + 1]
        * (CASE WHEN acm.qp >= 24 THEN 16 ELSE 8 END) END AS dac
    FROM acm
  ) acm
  JOIN dd ON dd.doc_id = acm.doc_id AND dd.m = acm.m
    AND dd.by = 2*(acm.b // 8) + (acm.b // 2) % 2
    AND dd.bx = 2*((acm.b // 4) % 2) + acm.b % 2
), gcols AS (
  SELECT doc_id, n_mbs, qp, m, b, bx, by,
    $gExprs
  FROM dcols
), vcols AS (
  SELECT doc_id, n_mbs, qp, m, b, bx, by,
    $veExprs
  FROM gcols
), pxc AS (
  SELECT doc_id, n_mbs, qp, m, b, bx, by,
    $pxExprs
  FROM vcols
), bot AS (
  SELECT doc_id, m,
    $botExprs
  FROM pxc GROUP BY doc_id, m
), pr AS (
  SELECT doc_id, 0::BIGINT AS m, 128::BIGINT AS pred, n_mbs FROM a
  UNION ALL
  SELECT pr.doc_id, pr.m + 1,
    (($predSum) + 8) // 16,
    pr.n_mbs
  FROM pr JOIN bot ON bot.doc_id = pr.doc_id AND bot.m = pr.m
  WHERE pr.m + 1 < pr.n_mbs
), tc1 AS (
  SELECT doc_id, (count(*) FILTER (c <> 0))::BIGINT AS t
  FROM cz GROUP BY doc_id
), tc2 AS (
  SELECT doc_id, (count(*) FILTER (p <> 0))::BIGINT AS t
  FROM acm GROUP BY doc_id
), pxl AS (
  SELECT pxc.doc_id, pxc.n_mbs, pxc.qp, pxc.m, pxc.b, pxc.bx, pxc.by, k.k,
    greatest(0, least(255, pr.pred + ([$pxList])[k.k + 1]))::BIGINT AS v
  FROM pxc
  JOIN pr ON pr.doc_id = pxc.doc_id AND pr.m = pxc.m
  CROSS JOIN unnest(range(0, 16)) k(k)
)
SELECT pxl.doc_id AS media_id, pxl.n_mbs, pxl.qp,
  (tc1.t + tc2.t)::BIGINT AS total_coeff,
  sum(pxl.v)::BIGINT AS luma_sum,
  min(pxl.v)::BIGINT AS luma_min,
  max(pxl.v)::BIGINT AS luma_max,
  sum(((((pxl.m*16 + pxl.by*4 + pxl.k // 4) * 16
         + pxl.bx*4 + pxl.k % 4) % 97) + 1) * pxl.v)::BIGINT AS luma_checksum
FROM pxl
JOIN tc1 ON tc1.doc_id = pxl.doc_id
JOIN tc2 ON tc2.doc_id = pxl.doc_id
GROUP BY pxl.doc_id, pxl.n_mbs, pxl.qp, tc1.t, tc2.t
ORDER BY media_id"""
  }

  private val unigramSegmentSql: String =
      """WITH RECURSIVE v0 AS (
        |  SELECT substr(d.text, p.p::INT, l.l::INT) AS piece
        |  FROM documents d
        |  CROSS JOIN unnest(range(2, 5)) l(l)
        |  CROSS JOIN unnest(range(1, d.n_chars - l.l + 2)) p(p)
        |), vc AS (
        |  SELECT piece, count(*)::BIGINT AS cnt
        |  FROM v0 GROUP BY piece HAVING count(*) >= 50
        |), vocab AS (
        |  SELECT piece FROM vc
        |  QUALIFY row_number() OVER (ORDER BY cnt DESC, piece ASC) <= 4096
        |), occ AS (
        |  SELECT d.doc_id, count(*)::BIGINT AS vocab_hits
        |  FROM documents d
        |  CROSS JOIN unnest(range(2, 5)) l(l)
        |  CROSS JOIN unnest(range(1, d.n_chars - l.l + 2)) p(p)
        |  JOIN vocab v ON v.piece = substr(d.text, p.p::INT, l.l::INT)
        |  GROUP BY d.doc_id
        |), dp AS (
        |  SELECT doc_id, text, n_chars::BIGINT AS n, 1::BIGINT AS i,
        |    1048575::BIGINT AS d0, 0::BIGINT AS d1,
        |    (-1000000000)::BIGINT AS d2, (-1000000000)::BIGINT AS d3
        |  FROM documents WHERE n_chars >= 1
        |  UNION ALL
        |  SELECT dp.doc_id, dp.text, dp.n, dp.i + 1,
        |    greatest(
        |      dp.d0 + 1048575,
        |      CASE WHEN dp.i + 1 >= 2 AND v2.piece IS NOT NULL
        |           THEN dp.d1 + 4*1048576 - 1 ELSE -1000000000 END,
        |      CASE WHEN dp.i + 1 >= 3 AND v3.piece IS NOT NULL
        |           THEN dp.d2 + 9*1048576 - 1 ELSE -1000000000 END,
        |      CASE WHEN dp.i + 1 >= 4 AND v4.piece IS NOT NULL
        |           THEN dp.d3 + 16*1048576 - 1 ELSE -1000000000 END),
        |    dp.d0, dp.d1, dp.d2
        |  FROM dp
        |  LEFT JOIN vocab v2 ON v2.piece = substr(dp.text, (dp.i)::INT, 2)
        |  LEFT JOIN vocab v3 ON v3.piece = substr(dp.text, (dp.i - 1)::INT, 3)
        |  LEFT JOIN vocab v4 ON v4.piece = substr(dp.text, (dp.i - 2)::INT, 4)
        |  WHERE dp.i + 1 <= dp.n
        |), fin AS (
        |  SELECT doc_id, n, d0 FROM dp WHERE i = n
        |)
        |SELECT f.doc_id, f.n AS n_chars,
        |  coalesce(o.vocab_hits, 0)::BIGINT AS vocab_hits,
        |  (f.d0 // 1048576 + 1)::BIGINT AS best_score,
        |  ((f.d0 // 1048576 + 1) * 1048576 - f.d0)::BIGINT AS best_pieces
        |FROM fin f LEFT JOIN occ o ON o.doc_id = f.doc_id
        |ORDER BY f.doc_id""".stripMargin

  private val kneserNeySql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
      |  FROM documents
      |), pos AS (
      |  SELECT doc_id, t[i::INT] AS u, t[(i + 1)::INT] AS w
      |  FROM toks CROSS JOIN unnest(range(1, len(t))) r(i)
      |  WHERE len(t) >= 2
      |), types AS (
      |  SELECT u, w, count(*)::BIGINT AS c FROM pos GROUP BY 1, 2
      |), ctx AS (
      |  SELECT u, sum(c)::BIGINT AS cu, count(*)::BIGINT AS nfw
      |  FROM types GROUP BY 1
      |), back AS (
      |  SELECT w, count(*)::BIGINT AS nbw FROM types GROUP BY 1
      |), tt AS (
      |  SELECT count(*)::DOUBLE AS t FROM types
      |)
      |SELECT doc_id, count(*)::BIGINT AS n_bigrams,
      |  round(avg(-ln(greatest(c - 0.75, 0.0) / cu
      |    + 0.75 * nfw / cu * (nbw / t))), 6) AS avg_neg_logprob
      |FROM pos
      |JOIN types USING (u, w)
      |JOIN ctx USING (u)
      |JOIN back USING (w)
      |CROSS JOIN tt
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  /** qd8/qs27 shared oracle (one SQL text serves both keys): Okapi BM25
    * over the corpus; the streaming form folds its postings/length/stats
    * state to exactly these inputs across the batch boundary. */
  private val bm25Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
      |  FROM documents
      |), postings AS (
      |  SELECT doc_id, term, count(*)::DOUBLE AS tf
      |  FROM toks WHERE term IN ('spark', 'query', 'window')
      |  GROUP BY doc_id, term
      |), dl AS (
      |  SELECT doc_id,
      |    len(string_split_regex(trim(text), '\s+'))::DOUBLE AS dl
      |  FROM documents
      |), stats AS (
      |  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
      |    (SELECT avg(dl) FROM dl) AS avgdl
      |), idf AS (
      |  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM postings
      |  GROUP BY term
      |), scored AS (
      |  SELECT p.doc_id,
      |    round(sum(ln((s.n - i.df + 0.5) / (i.df + 0.5) + 1.0)
      |      * (p.tf * 2.2)
      |      / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * d.dl / s.avgdl))), 6) AS score,
      |    count(*) AS n_terms_matched
      |  FROM postings p
      |  CROSS JOIN stats s
      |  JOIN idf i ON p.term = i.term
      |  JOIN dl d ON p.doc_id = d.doc_id
      |  GROUP BY p.doc_id
      |)
      |SELECT row_number() OVER (ORDER BY score DESC, doc_id) AS rank,
      |  doc_id, score, n_terms_matched
      |FROM scored
      |ORDER BY score DESC, doc_id
      |LIMIT 10""".stripMargin

  /** qd35/qs25 shared oracle (one SQL text serves both keys). */
  private val leakSplitSql: String =
    s"""WITH RECURSIVE $shinglePairGraphSql, e AS (
        |  SELECT doc_a AS a, doc_b AS b FROM p
        |  UNION SELECT doc_b, doc_a FROM p
        |), r(s, t2) AS (
        |  SELECT a, a FROM (SELECT DISTINCT a FROM e)
        |  UNION
        |  SELECT r.s, e.b FROM r JOIN e ON r.t2 = e.a
        |), cc AS (
        |  SELECT s AS doc_id, min(t2) AS cluster_rep FROM r GROUP BY s
        |), b AS (
        |  SELECT d.doc_id, coalesce(cc.cluster_rep, d.doc_id) AS rep
        |  FROM documents d LEFT JOIN cc ON cc.doc_id = d.doc_id
        |)
        |SELECT doc_id, rep,
        |  (md5_number_lower('split:' || rep::VARCHAR) % 100)::INT AS bucket,
        |  CASE WHEN (md5_number_lower('split:' || rep::VARCHAR) % 100) < 90
        |         THEN 'train'
        |       WHEN (md5_number_lower('split:' || rep::VARCHAR) % 100) < 95
        |         THEN 'val'
        |       ELSE 'test' END AS split
        |FROM b
        |ORDER BY doc_id""".stripMargin

  /** qm6/qs26 shared oracle (one SQL text serves both keys). */
  private val multimodalCurationSql: String =
    s"""WITH RECURSIVE $shinglePairGraphSql, e AS (
        |  SELECT doc_a AS a, doc_b AS b FROM p
        |  UNION SELECT doc_b, doc_a FROM p
        |), r(s, t2) AS (
        |  SELECT a, a FROM (SELECT DISTINCT a FROM e)
        |  UNION
        |  SELECT r.s, e.b FROM r JOIN e ON r.t2 = e.a
        |), drop_members AS (
        |  SELECT s AS doc_id FROM r GROUP BY s HAVING s <> min(t2)
        |), $phashCoreSql, ph AS (
        |  SELECT media_id AS doc_id,
        |    media_id <> min(media_id) OVER (PARTITION BY dhash) AS dup
        |  FROM h
        |), fl AS (
        |  SELECT doc_id,
        |    len(string_split_regex(trim(text), '\\s+')) >= 30
        |      AND length(text) >= 200 AS quality_ok,
        |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
        |      AS exact_keep,
        |    doc_id IN (SELECT doc_id FROM drop_members) AS neardup_drop
        |  FROM documents
        |)
        |SELECT f.doc_id,
        |  CASE f.doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'video'
        |    ELSE 'audio' END AS modality,
        |  f.quality_ok, f.exact_keep, f.neardup_drop,
        |  coalesce(ph.dup, false) AS phash_drop,
        |  (f.quality_ok AND f.exact_keep AND NOT f.neardup_drop
        |    AND NOT coalesce(ph.dup, false)) AS keep
        |FROM fl f LEFT JOIN ph ON ph.doc_id = f.doc_id
        |ORDER BY f.doc_id""".stripMargin

  private val pqSql: String = pqSqlAt(Ann.DefaultMaxQueries)

  /** qe8's oracle at an explicit query-sample cap — the default-cap
    * instance serves qe8; the LOW-cap instance (cap < Q at the gate)
    * oracle-proves the `querySample` truncation path itself: the hashed
    * total order and LIMIT must pick the identical query subset in both
    * engines, or every capped driver structure in the ADC family is
    * only code-read, never hash-checked (VERDICT r10 #5). */
  private def pqSqlAt(maxQ: Int): String =
    s"""WITH e AS (
        |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
        |), sv AS (
        |  SELECT vec_id, s.sub,
        |    list_transform(range(s.sub * 16 + 1, s.sub * 16 + 17),
        |      j -> v[j::INT]) AS x
        |  FROM e CROSS JOIN (SELECT unnest(range(0, 4)) AS sub) s
        |), nn AS (
        |  SELECT count(*) AS n FROM e
        |), sd AS MATERIALIZED (
        |  SELECT rk.sub, (((rk.rn - 1) * ${Ann.DefaultPqCodes}) // nn.n)::INT
        |    AS code, rk.x
        |  FROM (
        |    SELECT sv.sub, sv.vec_id, sv.x,
        |      row_number() OVER (PARTITION BY sv.sub
        |        ORDER BY sv.x[1], sv.vec_id) AS rn
        |    FROM sv
        |  ) rk CROSS JOIN nn
        |), comp AS (
        |  SELECT sub, code, r.i AS dim, avg(x[r.i::INT]) AS m
        |  FROM sd CROSS JOIN unnest(range(1, len(x) + 1)) r(i)
        |  GROUP BY 1, 2, 3
        |), cb0 AS MATERIALIZED (
        |  SELECT sub, code, list(m ORDER BY dim) AS cw FROM comp
        |  GROUP BY sub, code
        |), ${pqRefineChainSql("sv", "cb0", "", Ann.DefaultPqRefineIters)}, cand AS (
        |  SELECT sv.vec_id, sv.sub, cb.code,
        |    list_inner_product(sv.x, sv.x) - 2 * list_inner_product(sv.x, cb.cw)
        |      + list_inner_product(cb.cw, cb.cw) AS d2
        |  FROM sv JOIN cb${Ann.DefaultPqRefineIters} cb ON cb.sub = sv.sub
        |), codes AS (
        |  SELECT vec_id, sub, code FROM (
        |    SELECT vec_id, sub, code,
        |      row_number() OVER (PARTITION BY vec_id, sub
        |        ORDER BY round(d2, 6), code) AS rk
        |    FROM cand
        |  ) WHERE rk = 1
        |), qsel AS (
        |  SELECT vec_id FROM e WHERE vec_id % 25 = 0
        |  ORDER BY (vec_id * 1000003) % 999983, vec_id LIMIT $maxQ
        |), lut AS (
        |  SELECT c.vec_id AS q_id, c.sub, c.code,
        |    CAST(round(c.d2 * 1e6) AS BIGINT) AS d2us
        |  FROM cand c JOIN qsel USING (vec_id)
        |), adc AS (
        |  SELECT l.q_id, co.vec_id AS cand_id, sum(l.d2us)::BIGINT AS adc_us
        |  FROM codes co JOIN lut l USING (sub, code)
        |  WHERE co.vec_id <> l.q_id
        |  GROUP BY 1, 2
        |)
        |SELECT q_id, rank, cand_id, adc_us FROM (
        |  SELECT q_id, cand_id, adc_us,
        |    row_number() OVER (PARTITION BY q_id ORDER BY adc_us, cand_id) AS rank
        |  FROM adc
        |) WHERE rank <= 5
        |ORDER BY q_id, rank""".stripMargin

  /** Generated N-step BPE trainer CTE chain shared by qd28/qd29 (r9:
    * depth 32, programmatic — the hand-written 3-step chain does not
    * scale to tokenizer depth). Step k: mK takes the weighted
    * adjacent-pair argmax over v(k-1) (count desc, then sym_a, sym_b —
    * binary collation both engines share); vK applies it greedily
    * left-to-right non-overlapping via the chr(1)-delimited replace().
    * An EMPTY mK (vocabulary degenerated to single-symbol words) makes
    * vK a no-op through the LEFT JOIN + CASE guard instead of emptying
    * the chain (ADVICE r8), matching the Scala loop's graceful stop —
    * and once empty, every later argmax is empty too, so the two
    * engines stop at the same merge table. */
  private def bpeChainSql(n: Int): String =
    (1 to n).map { k =>
      s"""m$k AS MATERIALIZED (
         |  SELECT sym_a, sym_b, n_occ FROM (
         |    SELECT cs[i] AS sym_a, cs[i+1] AS sym_b, sum(wc)::BIGINT AS n_occ
         |    FROM v${k - 1} CROSS JOIN unnest(range(1, len(cs))) r(i) GROUP BY 1, 2
         |  ) ORDER BY n_occ DESC, sym_a, sym_b LIMIT 1
         |), v$k AS MATERIALIZED (
         |  SELECT term, wc,
         |    CASE WHEN m.sym_a IS NULL THEN cs
         |    ELSE list_filter(string_split(replace(
         |      array_to_string(list_transform(cs, c -> chr(1) || c || chr(1)), ''),
         |      chr(1) || m.sym_a || chr(1) || chr(1) || m.sym_b || chr(1),
         |      chr(1) || m.sym_a || m.sym_b || chr(1)), chr(1)),
         |      x -> x <> '') END AS cs
         |  FROM v${k - 1} LEFT JOIN m$k m ON true
         |)""".stripMargin
    }.mkString(", ")

  private def bpeMergesSql(n: Int): String = {
    val union = (1 to n).map(k =>
      s"SELECT $k::BIGINT AS iter, sym_a, sym_b, n_occ FROM m$k")
      .mkString("\n  UNION ALL ")
    s"""WITH toks AS (
       |  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS term
       |  FROM documents
       |), w AS (
       |  SELECT term, count(*) AS wc FROM toks WHERE term <> '' GROUP BY term
       |), v0 AS MATERIALIZED (
       |  SELECT term, wc, string_split(term, '') || ['</w>'] AS cs FROM w
       |), ${bpeChainSql(n)}
       |SELECT * FROM (
       |  $union
       |) ORDER BY iter""".stripMargin
  }

  private def bpeEncodeSql(n: Int): String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
       |  FROM documents
       |), w AS (
       |  SELECT term, count(*) AS wc FROM toks WHERE term <> '' GROUP BY term
       |), v0 AS MATERIALIZED (
       |  SELECT term, wc, string_split(term, '') || ['</w>'] AS cs FROM w
       |), ${bpeChainSql(n)}, enc AS (
       |  SELECT term, len(cs)::BIGINT AS n_syms FROM v$n
       |)
       |SELECT doc_id, count(*)::BIGINT AS n_words,
       |  sum(n_syms)::BIGINT AS n_tokens,
       |  round(sum(n_syms)::DOUBLE / count(*), 6) AS tokens_per_word
       |FROM toks JOIN enc USING (term)
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  /** The shared qd38/qd39 CTE prefix: the FULL merge chain
    * (bpeChainSql) → dense subword ids by binary-collation rank →
    * per-word id lists → one global cumsum for word offsets → the
    * positioned (doc_id, pos, tid) token stream. */
  private def packedPosChainSql(n: Int): String =
    s"""t AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
       |  FROM documents
       |), toks AS (
       |  SELECT doc_id, r.i AS widx, toks[r.i::INT] AS term
       |  FROM t CROSS JOIN unnest(range(1, len(toks) + 1)) r(i)
       |  WHERE toks[r.i::INT] <> ''
       |), w AS (
       |  SELECT term, count(*) AS wc FROM toks GROUP BY term
       |), v0 AS MATERIALIZED (
       |  SELECT term, wc, string_split(term, '') || ['</w>'] AS cs FROM w
       |), ${bpeChainSql(n)}, sym AS (
       |  SELECT sym, row_number() OVER (ORDER BY sym) AS sym_id FROM (
       |    SELECT DISTINCT unnest(cs) AS sym FROM v$n
       |  )
       |), enc AS (
       |  SELECT v.term, list(s.sym_id ORDER BY r.i) AS ids,
       |    count(*)::BIGINT AS ns
       |  FROM v$n v CROSS JOIN unnest(range(1, len(v.cs) + 1)) r(i)
       |  JOIN sym s ON s.sym = v.cs[r.i::INT]
       |  GROUP BY v.term
       |), word_off AS (
       |  SELECT tk.doc_id, e.ids, e.ns,
       |    (sum(e.ns) OVER (ORDER BY tk.doc_id, tk.widx
       |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |     - e.ns)::BIGINT AS woff
       |  FROM toks tk JOIN enc e USING (term)
       |), pos AS (
       |  SELECT wo.doc_id, (wo.woff + r.i - 1)::BIGINT AS pos,
       |    wo.ids[r.i::INT] AS tid
       |  FROM word_off wo CROSS JOIN unnest(range(1, wo.ns + 1)) r(i)
       |)""".stripMargin

  /** qd38's oracle: fixed-budget packing of the positioned stream. */
  private def packedSeqSql(n: Int, budget: Int): String =
    s"""WITH ${packedPosChainSql(n)}
       |SELECT (pos // $budget)::BIGINT AS seq_id, count(*)::BIGINT AS n_tokens,
       |  string_agg(tid::VARCHAR, ' ' ORDER BY pos) AS token_ids
       |FROM pos GROUP BY 1 ORDER BY seq_id""".stripMargin

  /** qd39's oracle: per-sequence ordered document spans (the loader's
    * cross-document attention-mask metadata) over the SAME positioned
    * stream. */
  private def packedSpanSql(n: Int, budget: Int): String =
    s"""WITH ${packedPosChainSql(n)}, spans AS (
       |  SELECT (pos // $budget)::BIGINT AS seq_id, doc_id,
       |    min(pos % $budget)::BIGINT AS start_slot, count(*)::BIGINT AS len
       |  FROM pos GROUP BY 1, 2
       |)
       |SELECT seq_id, count(*)::BIGINT AS n_docs, sum(len)::BIGINT AS n_tokens,
       |  string_agg(doc_id::VARCHAR || ':' || start_slot::VARCHAR || ':'
       |      || len::VARCHAR, ' ' ORDER BY start_slot) AS doc_spans
       |FROM spans GROUP BY seq_id ORDER BY seq_id""".stripMargin


  /** qe9 / qs20 shared oracle: IVF probe CTEs restricting the integer
    * ADC ranking to each query's nprobe=2 cells (the streaming form
    * ingests into a cell-partitioned codes index and folds to the
    * identical ranking — divergence fails the gate). */
  private val ivfPqSql: String =
      s"""WITH e AS (
        |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
        |), sv AS (
        |  SELECT vec_id, s.sub,
        |    list_transform(range(s.sub * 16 + 1, s.sub * 16 + 17),
        |      j -> v[j::INT]) AS x
        |  FROM e CROSS JOIN (SELECT unnest(range(0, 4)) AS sub) s
        |), nn AS (
        |  SELECT count(*) AS n FROM e
        |), sd AS MATERIALIZED (
        |  SELECT rk.sub, (((rk.rn - 1) * ${Ann.DefaultPqCodes}) // nn.n)::INT
        |    AS code, rk.x
        |  FROM (
        |    SELECT sv.sub, sv.vec_id, sv.x,
        |      row_number() OVER (PARTITION BY sv.sub
        |        ORDER BY sv.x[1], sv.vec_id) AS rn
        |    FROM sv
        |  ) rk CROSS JOIN nn
        |), comp AS (
        |  SELECT sub, code, r.i AS dim, avg(x[r.i::INT]) AS m
        |  FROM sd CROSS JOIN unnest(range(1, len(x) + 1)) r(i)
        |  GROUP BY 1, 2, 3
        |), cb0 AS MATERIALIZED (
        |  SELECT sub, code, list(m ORDER BY dim) AS cw FROM comp
        |  GROUP BY sub, code
        |), ${pqRefineChainSql("sv", "cb0", "", Ann.DefaultPqRefineIters)}, cand AS (
        |  SELECT sv.vec_id, sv.sub, cb.code,
        |    list_inner_product(sv.x, sv.x) - 2 * list_inner_product(sv.x, cb.cw)
        |      + list_inner_product(cb.cw, cb.cw) AS d2
        |  FROM sv JOIN cb${Ann.DefaultPqRefineIters} cb ON cb.sub = sv.sub
        |), codes AS (
        |  SELECT vec_id, sub, code FROM (
        |    SELECT vec_id, sub, code,
        |      row_number() OVER (PARTITION BY vec_id, sub
        |        ORDER BY round(d2, 6), code) AS rk
        |    FROM cand
        |  ) WHERE rk = 1
        |), qsel AS (
        |  SELECT vec_id FROM e WHERE vec_id % 25 = 0
        |  ORDER BY (vec_id * 1000003) % 999983, vec_id LIMIT ${Ann.DefaultMaxQueries}
        |), lut AS (
        |  SELECT c.vec_id AS q_id, c.sub, c.code,
        |    CAST(round(c.d2 * 1e6) AS BIGINT) AS d2us
        |  FROM cand c JOIN qsel USING (vec_id)
        |), cents AS (
        |  SELECT cell, list(m ORDER BY dim) AS centroid FROM (
        |    SELECT label AS cell, i AS dim, avg(v[i::INT]) AS m
        |    FROM e CROSS JOIN unnest(range(1, len(v) + 1)) r(i)
        |    GROUP BY 1, 2
        |  ) GROUP BY cell
        |), assign AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT e.vec_id, c.cell,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        round(list_inner_product(e.v, c.centroid)
        |          / (sqrt(list_inner_product(e.v, e.v))
        |             * sqrt(list_inner_product(c.centroid, c.centroid))), 6) DESC,
        |        c.cell) AS rk
        |    FROM e CROSS JOIN cents c
        |  ) WHERE rk = 1
        |), q AS (
        |  SELECT vec_id AS q_id, v AS q_vec FROM e JOIN qsel USING (vec_id)
        |), probed AS (
        |  SELECT q_id, cell FROM (
        |    SELECT q.q_id, c.cell,
        |      row_number() OVER (PARTITION BY q.q_id ORDER BY
        |        round(list_inner_product(q.q_vec, c.centroid)
        |          / (sqrt(list_inner_product(q.q_vec, q.q_vec))
        |             * sqrt(list_inner_product(c.centroid, c.centroid))), 6) DESC,
        |        c.cell) AS crk
        |    FROM q CROSS JOIN cents c
        |  ) WHERE crk <= 2
        |), adc AS (
        |  SELECT l.q_id, co.vec_id AS cand_id, sum(l.d2us)::BIGINT AS adc_us
        |  FROM codes co
        |  JOIN assign a ON a.vec_id = co.vec_id
        |  JOIN probed p ON p.cell = a.cell
        |  JOIN lut l ON l.q_id = p.q_id AND l.sub = co.sub AND l.code = co.code
        |  WHERE co.vec_id <> l.q_id
        |  GROUP BY 1, 2
        |)
        |SELECT q_id, rank, cand_id, adc_us FROM (
        |  SELECT q_id, cand_id, adc_us,
        |    row_number() OVER (PARTITION BY q_id ORDER BY adc_us, cand_id) AS rank
        |  FROM adc
        |) WHERE rank <= 5
        |ORDER BY q_id, rank""".stripMargin
  private val dsirSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    (md5_number_lower('dsir:' || doc_id::VARCHAR) % 20 = 0) AS is_t,
      |    string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents
      |  WHERE len(string_split_regex(trim(text), '\s+')) >= 2
      |), bi AS MATERIALIZED (
      |  SELECT doc_id, is_t,
      |    (md5_number_lower('dsir:' || toks[i] || ' ' || toks[i+1])
      |      % 1024)::INT AS bucket
      |  FROM t CROSS JOIN unnest(range(1, len(toks))) r(i)
      |), cnt AS MATERIALIZED (
      |  SELECT bucket,
      |    count(*) FILTER (WHERE is_t) AS ct,
      |    count(*) FILTER (WHERE NOT is_t) AS cr
      |  FROM bi GROUP BY bucket
      |), tot AS (
      |  SELECT sum(ct)::DOUBLE AS nt, sum(cr)::DOUBLE AS nr FROM cnt
      |), lr AS (
      |  SELECT bucket,
      |    ln((ct + 1)::DOUBLE / (nt + 1024))
      |      - ln((cr + 1)::DOUBLE / (nr + 1024)) AS logratio
      |  FROM cnt CROSS JOIN tot
      |)
      |SELECT doc_id, count(*) AS n_bigrams,
      |  round(avg(logratio), 6) AS dsir_logratio
      |FROM bi JOIN lr USING (bucket)
      |WHERE NOT is_t
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  /** qs17's oracle: identical model CTEs to dsirSql, but the score is
    * the stream's weighted mean over the per-doc bucket HISTOGRAM
    * (Σ n·logratio / Σ n) instead of the per-instance avg, so both
    * engines sum the same terms (ADVICE r8). */
  private val dsirWeightedSql: String = {
    val head = dsirSql.substring(0, dsirSql.indexOf("SELECT doc_id, count(*)"))
    head +
      """SELECT doc_id, sum(n)::BIGINT AS n_bigrams,
        |  round(sum(n * logratio) / sum(n), 6) AS dsir_logratio
        |FROM (
        |  SELECT doc_id, bucket, count(*) AS n
        |  FROM bi WHERE NOT is_t GROUP BY 1, 2
        |) f JOIN lr USING (bucket)
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin
  }

  /** The qd23/qs16 shared oracle (the streaming form converges to the
    * same mark set, so one SQL text serves both keys — divergence would
    * show as one of the two failing the gate). 8-token windows repeating
    * ≥ 2× corpus-wide, merged per doc into maximal spans (windows ≤ 8
    * apart touch or overlap); positions 1-based; span covers tokens
    * [span_start, span_start + span_len). */
  private val dupSpansSql: String =
    """WITH t AS MATERIALIZED (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents
      |), sh AS MATERIALIZED (
      |  SELECT doc_id, i AS pos,
      |    array_to_string(toks[i::INT:(i + 7)::INT], ' ') AS shingle
      |  FROM t CROSS JOIN unnest(range(1, len(toks) - 8 + 2)) r(i)
      |), dup AS MATERIALIZED (
      |  SELECT shingle FROM sh GROUP BY shingle HAVING count(*) >= 2
      |), lg AS (
      |  SELECT doc_id, pos,
      |    lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
      |  FROM sh s JOIN dup d USING (shingle)
      |), isl AS (
      |  SELECT doc_id, pos,
      |    sum(CASE WHEN prev IS NULL OR pos > prev + 8 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY doc_id ORDER BY pos
      |            ROWS UNBOUNDED PRECEDING) AS island
      |  FROM lg
      |), sp AS (
      |  SELECT doc_id, min(pos)::BIGINT AS span_start,
      |    (max(pos) + 8 - min(pos))::BIGINT AS span_len,
      |    count(*)::BIGINT AS n_dup_shingles
      |  FROM isl GROUP BY doc_id, island
      |)
      |SELECT sp.doc_id, span_start, span_len, n_dup_shingles,
      |  array_to_string(
      |    t.toks[span_start::INT:(span_start + span_len - 1)::INT],
      |    ' ') AS span_text
      |FROM sp JOIN t USING (doc_id)
      |ORDER BY sp.doc_id, span_start""".stripMargin

  /** DuckDB-runnable oracle SQL, one per `queries` key. */
  def oracleSql: Map[String, String] = Map(
    // avg_* columns use the engine-exact integer half-up mean (see
    // graft.functions.ExactStats): q = (2·|S·1e6| + 100·n) // (200·n),
    // sign reapplied, ÷ 1e4 — identical in any engine.
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum((l_quantity)::DECIMAL(20,6)), 2)::DOUBLE AS sum_qty,
        | round(sum((l_extendedprice)::DECIMAL(20,6)), 2)::DOUBLE AS sum_base_price,
        | round(sum((l_extendedprice * (1.0 - l_discount))::DECIMAL(20,6)), 2)::DOUBLE AS sum_disc_price,
        | round(sum((l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax))::DECIMAL(20,6)), 2)::DOUBLE AS sum_charge,
        | ((abs((sum(l_quantity::DECIMAL(20,6)) * 1000000)::BIGINT) * 2
        |    + 100 * count(l_quantity)) // (200 * count(l_quantity)))::DOUBLE
        |   / 10000 AS avg_qty,
        | ((abs((sum(l_extendedprice::DECIMAL(20,6)) * 1000000)::BIGINT) * 2
        |    + 100 * count(l_extendedprice)) // (200 * count(l_extendedprice)))::DOUBLE
        |   / 10000 AS avg_price,
        | ((abs((sum(l_discount::DECIMAL(20,6)) * 1000000)::BIGINT) * 2
        |    + 100 * count(l_discount)) // (200 * count(l_discount)))::DOUBLE
        |   / 10000 AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        | round(l_extendedprice * l_discount, 4) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q3_join_agg" ->
      """SELECT n_name,
        | count(*) AS n_orders,
        | round(sum((o_totalprice)::DECIMAL(20,6)), 2)::DOUBLE AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    "q4_left_join_sentinel" ->
      """SELECT c_custkey, c_name,
        | coalesce(order_cnt, 0) AS order_cnt,
        | coalesce(total_spent, -1.0) AS total_spent
        |FROM customer
        |LEFT JOIN (
        |  SELECT o_custkey, count(*) AS order_cnt,
        |    round(sum((o_totalprice)::DECIMAL(20,6)), 2)::DOUBLE AS total_spent
        |  FROM orders GROUP BY o_custkey
        |) ON c_custkey = o_custkey
        |ORDER BY c_custkey""".stripMargin,

    "q5_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM events WHERE user_id = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q6_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q7_topk_groups" ->
      """SELECT user_id, count(*) AS doc_count,
        | ((abs((sum(value::DECIMAL(20,6)) * 1000000)::BIGINT) * 2
        |    + 100 * count(value)) // (200 * count(value)))::DOUBLE
        |   / 10000 AS val_avg,
        | round(sum((value)::DECIMAL(20,6)), 2)::DOUBLE AS val_sum
        |FROM events
        |WHERE ts::TIMESTAMP >= TIMESTAMP '2024-01-15 00:00:00'
        |GROUP BY user_id
        |ORDER BY doc_count DESC, user_id
        |LIMIT 10""".stripMargin,

    "q8_latest_per_key" ->
      """SELECT user_id, event_id, event_type, epoch_us(ts::TIMESTAMP) AS ts_us
        |FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY user_id
        |    ORDER BY ts::TIMESTAMP DESC, event_id DESC) AS rn
        |  FROM events
        |) WHERE rn = 1
        |ORDER BY user_id""".stripMargin,

    "q9_ordered_series" ->
      """SELECT user_id, count(*) AS doc_count,
        | string_agg(event_type, ',' ORDER BY ts::TIMESTAMP, event_id) AS type_series,
        | string_agg(event_id::VARCHAR, ',' ORDER BY ts::TIMESTAMP, event_id) AS id_series
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    "q10_topn_per_key" ->
      """SELECT user_id, rn, event_id, event_type
        |FROM (
        |  SELECT user_id, event_id, event_type, row_number() OVER (
        |    PARTITION BY user_id
        |    ORDER BY ts::TIMESTAMP DESC, event_id DESC) AS rn
        |  FROM events
        |) WHERE rn <= 3
        |ORDER BY user_id, rn""".stripMargin,

    "q11_quality_rowcounts" ->
      Tables.all.map(t =>
        s"SELECT '$t' AS tbl, count(*) AS row_cnt, count(*) >= 1 AS pass FROM $t"
      ).mkString("", " UNION ALL ", " ORDER BY tbl"),

    "q12_quality_nulls" -> {
      val cols = Map(
        "region" -> Seq("r_regionkey", "r_name"),
        "nation" -> Seq("n_nationkey", "n_name", "n_regionkey"),
        "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
        "supplier" -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
        "part" -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
        "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"),
        "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"),
        "events" -> Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
        "documents" -> Seq("doc_id", "text", "lang", "source", "n_chars"),
        "embeddings" -> Seq("vec_id", "embedding", "label"))
      cols.toSeq.sortBy(_._1).map { case (t, cs) =>
        val sum = cs.map(c => s"(count(*) - count($c))").mkString(" + ")
        s"SELECT '$t' AS tbl, count(*) AS n_rows, $sum AS n_nulls FROM $t"
      }.mkString("", " UNION ALL ", " ORDER BY tbl")
    },

    "q13_scalar_chain" ->
      """SELECT p_partkey,
        | regexp_extract(p_name, '([a-z]+)$', 1) AS name_last_word,
        | string_split(p_name, ' ')[1] AS name_first_word,
        | upper(p_brand) AS brand_u,
        | concat_ws('|', p_brand, p_type) AS brand_type_key,
        | printf('#%02x%02x%02x', p_size, (p_size * 2) % 256, 255 - p_size) AS hex_color,
        | lpad(p_partkey::VARCHAR, 8, '0') AS key_pad,
        | round(p_retailprice * 1.1, 2) AS inflated_price
        |FROM part
        |ORDER BY p_partkey""".stripMargin,

    "q14_time_features" ->
      """SELECT event_id,
        | epoch_us(ts::TIMESTAMP) AS ts_us,
        | year(ts::TIMESTAMP) AS y,
        | month(ts::TIMESTAMP) AS m,
        | day(ts::TIMESTAMP) AS d,
        | hour(ts::TIMESTAMP) AS h,
        | minute(ts::TIMESTAMP) AS mi,
        | strftime(ts::TIMESTAMP, '%Y-%m-%d') AS day_str,
        | epoch_us(ts::TIMESTAMP + INTERVAL 1 DAY) AS ts_plus_day_us,
        | epoch_us(epoch_ms(event_id)) AS ms_roundtrip_us
        |FROM events
        |WHERE event_id < 500
        |ORDER BY event_id""".stripMargin,

    "q15_json_extract" ->
      """SELECT event_id, (props->>'$.k')::INTEGER AS k
        |FROM events
        |WHERE (props->>'$.k')::INTEGER > 50
        |ORDER BY event_id""".stripMargin,

    // EXCEPT + INTERSECT + UNION ALL, each branch non-empty by
    // construction (cross-table key sets).
    "q16_set_ops" ->
      """SELECT 'customer_no_events' AS set_name, key FROM (
        |  SELECT c_custkey AS key FROM customer
        |  EXCEPT
        |  SELECT user_id FROM events)
        |UNION ALL
        |SELECT 'evented_with_orders' AS set_name, key FROM (
        |  SELECT user_id AS key FROM events
        |  INTERSECT
        |  SELECT o_custkey FROM orders)
        |ORDER BY set_name, key""".stripMargin,

    "q17_case_sentinel" ->
      """SELECT c_custkey,
        | CASE WHEN c_acctbal < 0 THEN 'negative'
        |      WHEN c_acctbal < 5000 THEN 'low'
        |      ELSE 'high' END AS bal_band,
        | CASE WHEN trim(c_mktsegment) = '' THEN NULL
        |      ELSE c_mktsegment END AS seg_norm,
        | round(greatest(c_acctbal, 0.0), 2) AS bal_floor,
        | round(least(c_acctbal, 1000.0), 2) AS bal_cap
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,

    "q18_hourly_rollup" ->
      """SELECT epoch_us(date_trunc('hour', ts::TIMESTAMP)) AS hour_us,
        | event_type, count(*) AS n_events,
        | round(sum((value)::DECIMAL(20,6)), 2)::DOUBLE AS value_sum
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY hour_us, event_type""".stripMargin,

    "q19_sessionize" ->
      """WITH t AS (
        |  SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) AS ts_us,
        |    lag(epoch_us(ts::TIMESTAMP)) OVER w AS prev_us
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id)
        |), s AS (
        |  SELECT *,
        |    (sum(CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000
        |        THEN 1 ELSE 0 END) OVER (
        |      PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS UNBOUNDED PRECEDING))::BIGINT AS session_id
        |  FROM t
        |)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(ts_us) AS start_us, max(ts_us) AS end_us
        |FROM s
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "qd1_dedup_exact" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id,
        | count(*) AS n_copies
        |FROM documents
        |GROUP BY md5(text)
        |ORDER BY keep_doc_id""".stripMargin,

    "qd2_token_count" ->
      """SELECT doc_id,
        | len(string_split_regex(trim(text), '\s+')) AS ws_tokens,
        | len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS bpe_tokens,
        | length(text) AS n_chars_actual
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "qd3_quality_score" ->
      """SELECT doc_id,
        | length(text) AS len,
        | len(string_split_regex(trim(text), '\s+')) AS n_words,
        | round(len(regexp_extract_all(text, '[^a-zA-Z0-9\s]'))::DOUBLE
        |   / length(text), 6) AS punct_ratio,
        | round(len(list_filter(string_split_regex(trim(text), '\s+'),
        |     w -> w IN ('the','a','of','and','to','in','is','on')))::DOUBLE
        |   / len(string_split_regex(trim(text), '\s+')), 6) AS stopword_ratio,
        | round(length(regexp_replace(text, '\s+', '', 'g'))::DOUBLE
        |   / len(string_split_regex(trim(text), '\s+')), 6) AS mean_word_len
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "qd4_lang_id" ->
      """WITH h AS (
        |  SELECT doc_id, lang AS labeled_lang,
        |   len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |     w -> w IN ('the','a','fast','slow','big','small'))) AS h_en,
        |   len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |     w -> w IN ('order','data','part','value'))) AS h_es,
        |   len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |     w -> w IN ('stream','batch','spark','hash'))) AS h_de,
        |   len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |     w -> w IN ('table','column','row','line'))) AS h_fr,
        |   len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |     w -> w IN ('query','join','merge','sort'))) AS h_zh
        |  FROM documents
        |)
        |SELECT doc_id, labeled_lang, h_en, h_es, h_de, h_fr, h_zh,
        | CASE WHEN h_en = greatest(h_en, h_es, h_de, h_fr, h_zh) THEN 'en'
        |      WHEN h_es = greatest(h_en, h_es, h_de, h_fr, h_zh) THEN 'es'
        |      WHEN h_de = greatest(h_en, h_es, h_de, h_fr, h_zh) THEN 'de'
        |      WHEN h_fr = greatest(h_en, h_es, h_de, h_fr, h_zh) THEN 'fr'
        |      ELSE 'zh' END AS predicted_lang
        |FROM h
        |ORDER BY doc_id""".stripMargin,

    "qd5_fingerprint" ->
      """SELECT doc_id,
        | md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fingerprint
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    // Candidate generation mirrors the engine's AllPairs prefix filter
    // (TextOps.qd6Pairs) rather than an all-pairs self-join within each
    // (lang, source) cell: the prefix filter is LOSSLESS for J >= t
    // under ANY consistent global token order (the minimal shared token
    // of a qualifying pair lies in both prefixes), and every candidate
    // is verified by the exact Jaccard below — so the result set is
    // bit-identical to the semantic all-pairs form (checked at
    // sf0.01/sf0.1: identical rows), while the oracle stays feasible at
    // sf10 where the cell-quadratic form is not (26 s vs hours: 3.2e9
    // cell pairs). The oracle's (df, tok) order need not match the
    // engine's — both candidate supersets contain all true pairs.
    "qd6_ngram_jaccard" ->
      """WITH d AS (
        |  SELECT doc_id, lang, source, n_chars,
        |    list_distinct(string_split_regex(trim(text), '\s+')) AS toks
        |  FROM documents
        |), posts AS (
        |  SELECT doc_id, unnest(toks) AS tok FROM d
        |), dfreq AS (
        |  SELECT tok, count(*) AS df FROM posts GROUP BY tok
        |), pre AS (
        |  SELECT p.doc_id, p.tok, dd.lang, dd.source, dd.n_chars
        |  FROM (
        |    SELECT doc_id, tok,
        |      row_number() OVER (PARTITION BY doc_id ORDER BY df, tok) AS rk
        |    FROM posts JOIN dfreq USING (tok)
        |  ) p
        |  JOIN d dd ON dd.doc_id = p.doc_id
        |  WHERE p.rk <= floor(0.5 * len(dd.toks)) + 1
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM pre a JOIN pre b
        |    ON a.tok = b.tok AND a.lang = b.lang AND a.source = b.source
        |   AND a.doc_id < b.doc_id AND abs(a.n_chars - b.n_chars) <= 16
        |)
        |SELECT doc_a, doc_b, jaccard FROM (
        |  SELECT c.doc_a, c.doc_b,
        |    len(list_intersect(da.toks, db.toks))::DOUBLE
        |      / len(list_distinct(list_concat(da.toks, db.toks)))::DOUBLE AS jaccard
        |  FROM cand c JOIN d da ON da.doc_id = c.doc_a
        |              JOIN d db ON db.doc_id = c.doc_b)
        |WHERE jaccard >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin,

    "qd7_keyword_search" ->
      """SELECT doc_id, lang, count(*) AS n_hits
        |FROM (
        |  SELECT doc_id, lang,
        |    unnest(string_split_regex(trim(text), '\s+')) AS token
        |  FROM documents
        |)
        |WHERE token = 'spark'
        |GROUP BY doc_id, lang
        |ORDER BY doc_id""".stripMargin,

    "q34_value_histogram" ->
      """SELECT event_type, floor(value / 50.0)::BIGINT AS bucket, count(*) AS n
        |FROM events
        |GROUP BY event_type, bucket
        |ORDER BY event_type, bucket""".stripMargin,

    "qd9_term_stats" ->
      """SELECT term, count(*) AS occurrences,
        | count(DISTINCT doc_id) AS doc_freq
        |FROM (SELECT doc_id,
        |        unnest(string_split_regex(trim(text), '\s+')) AS term
        |      FROM documents)
        |GROUP BY term
        |ORDER BY occurrences DESC, term
        |LIMIT 20""".stripMargin,

    // Fixed-size token chunks (64/stride 48) — the pretraining
    // document→sample step; chunk content verified via md5.
    "qd11_chunking" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, i AS chunk_idx,
        |    list_slice(toks, i*48 + 1, i*48 + 64) AS chunk
        |  FROM t CROSS JOIN unnest(range(0, (len(toks) + 47) // 48)) r(i)
        |)
        |SELECT doc_id, chunk_idx, len(chunk)::BIGINT AS n_chunk_tokens,
        |  md5(array_to_string(chunk, ' ')) AS chunk_hash
        |FROM c
        |ORDER BY doc_id, chunk_idx""".stripMargin,

    // Gopher-style repetition signals: duplicate-token fraction and the
    // most-frequent-bigram share.
    "qd12_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents
        |), base AS (
        |  SELECT doc_id, len(toks)::BIGINT AS n_tokens,
        |    len(list_distinct(toks))::BIGINT AS n_distinct
        |  FROM t
        |), bg AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(toks)),
        |      i -> toks[i] || ' ' || toks[i+1])) AS bigram
        |  FROM t
        |), top AS (
        |  SELECT doc_id, max(c) AS top_bigram_n FROM (
        |    SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY doc_id, bigram)
        |  GROUP BY doc_id
        |)
        |SELECT b.doc_id, b.n_tokens, b.n_distinct,
        |  round(1.0 - b.n_distinct::DOUBLE / b.n_tokens::DOUBLE, 6) AS dup_token_ratio,
        |  coalesce(t2.top_bigram_n, 0) AS top_bigram_n,
        |  CASE WHEN b.n_tokens > 1
        |    THEN round(coalesce(t2.top_bigram_n, 0)::DOUBLE
        |      / (b.n_tokens - 1)::DOUBLE, 6)
        |    ELSE 0.0 END AS top_bigram_ratio
        |FROM base b LEFT JOIN top t2 ON b.doc_id = t2.doc_id
        |ORDER BY b.doc_id""".stripMargin,

    // PII redaction over deterministically planted contacts (the corpus
    // itself is PII-free): counts + redacted-text hash.
    "qd13_pii_redaction" ->
      """WITH p AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 3 = 0
        |      THEN ' contact user' || doc_id::VARCHAR || '@example.com'
        |      ELSE '' END ||
        |    CASE WHEN doc_id % 2 = 0
        |      THEN ' call 555-01' || doc_id::VARCHAR
        |      ELSE '' END AS t
        |  FROM documents
        |)
        |SELECT doc_id,
        |  len(regexp_extract_all(t,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}'))::BIGINT AS n_emails,
        |  len(regexp_extract_all(t, '[0-9]{3}-[0-9]+'))::BIGINT AS n_phones,
        |  md5(regexp_replace(regexp_replace(t,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{3}-[0-9]+', '<PHONE>', 'g')) AS redacted_hash
        |FROM p
        |ORDER BY doc_id""".stripMargin,

    // Benchmark-contamination screen: distinct 3-shingle hits against the
    // doc_id < 5 benchmark shingle set.
    "qd14_contamination" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents
        |), d AS (
        |  SELECT doc_id, CASE WHEN len(toks) >= 3 THEN list_distinct(
        |      list_transform(range(1, len(toks) - 1),
        |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
        |    ELSE [] END AS sh
        |  FROM t
        |), ex AS (
        |  SELECT doc_id, unnest(sh) AS shingle FROM d
        |), bench AS (
        |  SELECT DISTINCT shingle FROM ex WHERE doc_id < 5
        |), hits AS (
        |  SELECT doc_id, count(*) AS n_contaminated
        |  FROM ex JOIN bench USING (shingle) GROUP BY doc_id
        |)
        |SELECT d.doc_id, len(d.sh)::BIGINT AS n_shingles,
        |  coalesce(h.n_contaminated, 0)::BIGINT AS n_contaminated,
        |  coalesce(h.n_contaminated, 0) >= 1 AS flagged
        |FROM d LEFT JOIN hits h ON d.doc_id = h.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // Deterministic hash split: md5-lower-64 of the salted id mod 100
    // (the SimHash-family md5_number_lower contract); train/val/test
    // at 90/5/5.
    // BPE merge candidates: per-word char sequences closed by '</w>',
    // adjacent symbol pairs weighted by corpus word frequency, top-20.
    // sum(BIGINT) is HUGEINT in DuckDB -> ::BIGINT.
    "qd27_bpe_pairs" ->
      """WITH w AS (
        |  SELECT term, count(*) AS wc FROM (
        |    SELECT unnest(string_split_regex(trim(text), '\s+')) AS term
        |    FROM documents
        |  ) GROUP BY term
        |), ch AS (
        |  SELECT wc, string_split(term, '') || ['</w>'] AS cs FROM w
        |), p AS (
        |  SELECT cs[i] AS sym_a, cs[i+1] AS sym_b, sum(wc)::BIGINT AS n_occ
        |  FROM ch CROSS JOIN unnest(range(1, len(cs))) r(i)
        |  GROUP BY 1, 2
        |)
        |SELECT * FROM (
        |  SELECT row_number() OVER (ORDER BY n_occ DESC, sym_a, sym_b) AS rank,
        |    sym_a, sym_b, n_occ
        |  FROM p
        |) WHERE rank <= 20
        |ORDER BY rank""".stripMargin,

    // Iterative BPE: N=32 argmax-merge-recount rounds (generated CTE
    // chain — see bpeChainSql). Each vK applies mK's winning pair
    // greedily left-to-right non-overlapping via replace() on a
    // chr(1)-delimited symbol string (replace scans left-to-right over
    // non-overlapping occurrences — exactly the Sennrich merge
    // semantics; the both-sides delimiter prevents a pair pattern
    // matching across symbol boundaries). An EMPTY argmax (vocabulary
    // degenerated to single-symbol words) makes vK a no-op via the
    // LEFT JOIN guard, mirroring the Scala loop's graceful stop
    // (ADVICE r8: the comma cross join emptied vK and collapsed the
    // report).
    "qd28_bpe_merges" -> bpeMergesSql(TextOps.DefaultBpeMerges),

    // BPE encoding under the 32-merge vocabulary: same generated
    // trainer CTEs as qd28 (term carried through), then the token
    // stream joins the post-merge symbol counts and aggregates per
    // document. Empty terms (whitespace-only docs) are excluded on
    // BOTH sides: Spark's inner join drops them naturally, and
    // DuckDB's string_split('','') = [] would otherwise encode '' as
    // the bare end-of-word marker.
    "qd29_bpe_encode" -> bpeEncodeSql(TextOps.DefaultBpeMerges),
    // qd38: the packed token-id artifact — merge chain + id assignment
    // + global packing in one mirror; budget/depth from TextOps defaults
    "qd38_packed_sequences" ->
      packedSeqSql(TextOps.DefaultBpeMerges, TextOps.DefaultPackBudget),
    // qd39: per-sequence doc spans — same positioned stream, span rollup
    "qd39_packed_doc_spans" ->
      packedSpanSql(TextOps.DefaultBpeMerges, TextOps.DefaultPackBudget),

    // Per-source distribution drift: JS divergence of each source's
    // hashed unigram distribution (B = 1024, 'drift:' salt, add-one
    // smoothing) vs the rest of the corpus; per-bucket contributions
    // accumulate as integer nano-nats so the per-source sum is exact.
    "qd30_domain_drift" -> driftSql,
    // streaming incremental form: per-batch (source, bucket) count
    // deltas fold to the identical report (one SQL text serves both
    // keys — divergence fails the gate)
    "qs19_stream_drift" -> driftSql,

    // Windowed drift alarms: JS divergence of each (source, window =
    // doc_id // 250) hashed-unigram distribution against the source's
    // LIFETIME distribution, add-one smoothing both sides, integer
    // nano-nat contributions. Streaming form folds per-batch
    // (source, w, bucket) deltas to the identical report.
    "qd31_windowed_drift" -> windowedDriftSql,
    "qs21_stream_wdrift" -> windowedDriftSql,

    // Count-min sketch: 4×16 counter grid under seeded md5 bucket
    // hashes, estimate = min over rows, reported beside the exact
    // count (overcount = collisions, deterministic). One SQL text
    // serves the batch and streaming keys.
    "qd33_cms_heavy_hitters" -> cmsSql,
    "qs22_stream_cms" -> cmsSql,

    // DSIR importance weights: hashed-bigram (B = 1024) target/raw
    // bucket models, add-one smoothing, per-raw-doc mean log ratio.
    // Target sample = md5_number_lower('dsir:'||doc_id) % 20 = 0.
    "qd26_dsir_weights" -> dsirSql,
    // streaming incremental form: per-batch bucket-count monoid deltas +
    // per-doc bucket histograms fold to the identical model and scores.
    // The SQL mirrors the stream's WEIGHTED-MEAN form — Σ n·logratio /
    // Σ n over the per-doc bucket histogram — rather than qd26's
    // per-instance avg: the two are the same real number, but their
    // double summation shapes differ, and a .xxxxxx5 boundary could
    // land the 6dp roundings apart (ADVICE r8). Mirroring the
    // histogram-weighted form makes the oracle's terms identical to
    // the engine's, leaving only commutative-reorder ULPs.
    "qs17_stream_dsir" -> dsirWeightedSql,

    "qd25_hash_split" ->
      """WITH b AS (
        |  SELECT doc_id, lang,
        |    (md5_number_lower('split:' || doc_id::VARCHAR) % 100)::INT AS bucket
        |  FROM documents
        |)
        |SELECT doc_id, lang, bucket,
        |  CASE WHEN bucket < 90 THEN 'train'
        |       WHEN bucket < 95 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM b
        |ORDER BY doc_id""".stripMargin,

    // Leakage-safe split: q33's recursive-CTE cluster resolution gives
    // every clustered doc its component rep; the qd25 bucket hash is
    // applied to the rep (own id when unclustered), so a near-dup
    // cluster can never straddle train/test. ONE SQL text serves the
    // batch form and the streaming form (qs25 folds its accumulated
    // pair state to the identical split map across the batch boundary).
    "qd35_leak_safe_split" -> leakSplitSql,
    "qs25_stream_leak_split" -> leakSplitSql,


    // Integer-micro PageRank over the shared-rare-shingle graph (df
    // 2..5 — bounded posting fanout; near-dup cliques are degree-regular
    // and provably uniform): each step a node emits
    // (r * 85) // (deg * 100) along every edge and collects the 0.15e6
    // teleport + the order-free integer inflow sum. The iteration CTEs
    // are GENERATED from TextOps.DefaultPageRankIters (the bpe-chain
    // pattern) so the oracle's K can never desync from the operator's.
    "qd36_pagerank" ->
      s"""WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
        |  FROM documents
        |), d AS MATERIALIZED (
        |  SELECT doc_id, list_distinct(
        |    list_transform(range(1, len(toks) - 1),
        |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
        |  FROM t WHERE len(toks) >= 3
        |), inv AS MATERIALIZED (
        |  SELECT doc_id, unnest(sh) AS s FROM d
        |), rare AS (
        |  SELECT s FROM inv GROUP BY s HAVING count(*) BETWEEN 2 AND 5
        |), pr AS MATERIALIZED (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM inv a JOIN rare USING (s) JOIN inv b USING (s)
        |  WHERE a.doc_id < b.doc_id
        |), e AS MATERIALIZED (
        |  SELECT doc_a AS src, doc_b AS dst FROM pr
        |  UNION ALL SELECT doc_b, doc_a FROM pr
        |), deg AS MATERIALIZED (
        |  SELECT src AS node, count(*)::BIGINT AS deg FROM e GROUP BY 1
        |), r0 AS (
        |  SELECT node, 1000000::BIGINT AS r FROM deg
        |)${(1 to TextOps.DefaultPageRankIters).map { k =>
        s""", r$k AS MATERIALIZED (
        |  SELECT e.dst AS node,
        |    (150000 + sum((r.r * 85) // (d2.deg * 100)))::BIGINT AS r
        |  FROM e
        |  JOIN r${k - 1} r ON r.node = e.src
        |  JOIN deg d2 ON d2.node = e.src
        |  GROUP BY e.dst
        |)"""
      }.mkString}
        |SELECT rK.node AS doc_id, deg.deg AS degree, rK.r AS rank_units
        |FROM r${TextOps.DefaultPageRankIters} rK
        |JOIN deg ON deg.node = rK.node
        |ORDER BY rank_units DESC, doc_id""".stripMargin,

    // Mean negative unigram log-probability per document (perplexity
    // filter stand-in).
    "qd18_unigram_logprob" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |  FROM documents
        |), counts AS (
        |  SELECT term, count(*) AS c FROM toks GROUP BY term
        |), total AS (
        |  SELECT sum(c)::DOUBLE AS n_total FROM counts
        |)
        |SELECT doc_id, count(*) AS n_tokens,
        |  round(avg(-ln(c::DOUBLE / n_total)), 6) AS avg_neg_logprob
        |FROM toks
        |JOIN counts USING (term)
        |CROSS JOIN total
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    // Top-3 characteristic terms per document by tf·ln(N/df).
    "qd19_tfidf_keywords" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |  FROM documents
        |), postings AS (
        |  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
        |), dfreq AS (
        |  SELECT term, count(*)::DOUBLE AS df FROM postings GROUP BY term
        |), nd AS (
        |  SELECT count(*)::DOUBLE AS n_docs FROM documents
        |), scored AS (
        |  SELECT p.doc_id, p.term,
        |    round(p.tf::DOUBLE * ln(n_docs / d.df), 6) AS score
        |  FROM postings p JOIN dfreq d USING (term) CROSS JOIN nd
        |)
        |SELECT doc_id,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank,
        |  term, score
        |FROM scored
        |QUALIFY rank <= 3
        |ORDER BY doc_id, rank""".stripMargin,

    // Concat-and-chunk sequence packing: integer window cumsum → integer
    // division — bit-exact layout in both engines (budget 512, qd2's
    // whitespace tokenizer).
    "qd20_sequence_pack" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    len(string_split_regex(trim(text), '\s+'))::BIGINT AS tok_cnt
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, tok_cnt,
        |    (sum(tok_cnt) OVER (ORDER BY doc_id
        |       ROWS UNBOUNDED PRECEDING))::BIGINT AS cum
        |  FROM t
        |)
        |SELECT doc_id, tok_cnt,
        |  (cum - tok_cnt) AS tok_offset,
        |  ((cum - tok_cnt) // 512) AS start_chunk,
        |  ((cum - tok_cnt) % 512) AS start_slot,
        |  ((cum - 1) // 512 - (cum - tok_cnt) // 512 + 1) AS n_chunks
        |FROM c
        |ORDER BY doc_id""".stripMargin,

    // Add-one-smoothed bigram conditionals from corpus-wide counts; the
    // per-doc average mirrors qd18's established avg(-ln p) shape.
    "qd21_bigram_logprob" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents
        |), uc AS MATERIALIZED (
        |  SELECT term, count(*)::BIGINT AS ca
        |  FROM (SELECT unnest(toks) AS term FROM t) GROUP BY term
        |), v AS (
        |  SELECT count(*)::DOUBLE AS v FROM uc
        |), bg AS MATERIALIZED (
        |  SELECT doc_id, toks[i] AS term, toks[i] || ' ' || toks[i+1] AS bg
        |  FROM t CROSS JOIN unnest(range(1, len(toks))) r(i)
        |), bc AS MATERIALIZED (
        |  SELECT bg, count(*)::BIGINT AS cab FROM bg GROUP BY bg
        |)
        |SELECT doc_id, count(*)::BIGINT AS n_bigrams,
        |  round(avg(-ln((cab + 1)::DOUBLE / (ca + v))), 6) AS avg_neg_logprob
        |FROM bg JOIN bc USING (bg) JOIN uc USING (term) CROSS JOIN v
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    // Interpolated trigram LM: p = 0.6 p3 + 0.3 p2 + 0.1 p1 with
    // add-one smoothing per order — the identical left-associated
    // double expression in both engines (qd21's proven contract), only
    // the per-doc avg rounded.
    "qd37_trigram_logprob" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents
        |), uc AS MATERIALIZED (
        |  SELECT term, count(*)::BIGINT AS cu
        |  FROM (SELECT unnest(toks) AS term FROM t) GROUP BY term
        |), v AS (
        |  SELECT count(*)::DOUBLE AS v, sum(cu)::DOUBLE AS n FROM uc
        |), bc AS MATERIALIZED (
        |  SELECT bg, count(*)::BIGINT AS cb FROM (
        |    SELECT toks[i] || ' ' || toks[i+1] AS bg
        |    FROM t CROSS JOIN unnest(range(1, len(toks))) r(i)
        |  ) GROUP BY bg
        |), tg AS MATERIALIZED (
        |  SELECT doc_id,
        |    toks[i] || ' ' || toks[i+1] AS ab,
        |    toks[i+1] || ' ' || toks[i+2] AS bcs,
        |    toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS tg,
        |    toks[i+1] AS b, toks[i+2] AS c
        |  FROM t CROSS JOIN unnest(range(1, len(toks) - 1)) r(i)
        |  WHERE len(toks) >= 3
        |), tc AS MATERIALIZED (
        |  SELECT tg, count(*)::BIGINT AS ct FROM tg GROUP BY tg
        |)
        |SELECT doc_id, count(*)::BIGINT AS n_trigrams,
        |  round(avg(-ln(
        |    0.6 * ((ct + 1)::DOUBLE / (cab + v))
        |    + 0.3 * ((cbc + 1)::DOUBLE / (cb_u + v))
        |    + 0.1 * ((cc_u + 1)::DOUBLE / (n + v)))), 6) AS avg_neg_logprob
        |FROM (
        |  SELECT g.doc_id, tc.ct, ab_c.cb AS cab, bc_c.cb AS cbc,
        |    ub.cu AS cb_u, uc2.cu AS cc_u
        |  FROM tg g
        |  JOIN tc ON tc.tg = g.tg
        |  JOIN bc ab_c ON ab_c.bg = g.ab
        |  JOIN bc bc_c ON bc_c.bg = g.bcs
        |  JOIN uc ub ON ub.term = g.b
        |  JOIN uc uc2 ON uc2.term = g.c
        |) CROSS JOIN v
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    // Stateless gear-hash CDC: a cut after 1-based char position i
    // (16 <= i < length) iff the 16-bit gear state at i has its top six
    // bits zero (h < 1024). The engine's kernel rolls
    // h = (h*2 + gear[cp%256]) mod 2^16 in O(1) per position; terms
    // shifted >= 16 places vanish mod 2^16, so the state at i EQUALS the
    // 16-term window sum computed here — a pure per-position predicate,
    // no recursion. The gear table is rebuilt from md5 identically in
    // both engines. keep_* decodes the lexicographic min over
    // doc_id*1e6 + chunk_idx (chunk counts are far below 1e6).
    "qd22_cdc_chunk_dedup" ->
      """WITH g AS MATERIALIZED (
        |  SELECT list((md5_number_lower('gear-' || i) % 65536)::BIGINT
        |              ORDER BY i) AS gear
        |  FROM range(256) t(i)
        |), c AS MATERIALIZED (
        |  SELECT doc_id, text,
        |    CASE WHEN length(text) >= 17 THEN
        |      list_filter(range(16, length(text)),
        |        i -> list_sum(list_transform(range(0, 16),
        |               j -> gear[(ord(substr(text, (i - j)::INT, 1))
        |                          % 256 + 1)::INT]
        |                    * (1::BIGINT << j::INT))) % 65536 < 1024)
        |    ELSE [] END AS cuts
        |  FROM documents CROSS JOIN g
        |), b AS MATERIALIZED (
        |  SELECT doc_id,
        |    list_append(list_prepend(0::BIGINT, cuts), length(text)::BIGINT)
        |      AS bounds,
        |    text
        |  FROM c
        |), ch AS MATERIALIZED (
        |  SELECT doc_id, (j - 1)::BIGINT AS chunk_idx,
        |    substr(text, (bounds[(j)::INT] + 1)::INT,
        |      (bounds[(j + 1)::INT] - bounds[(j)::INT])::INT) AS chunk
        |  FROM b CROSS JOIN unnest(range(1, len(bounds))) r(j)
        |)
        |SELECT md5(chunk) AS chunk_md5, count(*)::BIGINT AS n_copies,
        |  count(DISTINCT doc_id)::BIGINT AS n_docs,
        |  (min(doc_id * 1000000 + chunk_idx) // 1000000)::BIGINT AS keep_doc_id,
        |  (min(doc_id * 1000000 + chunk_idx) % 1000000)::BIGINT AS keep_chunk_idx,
        |  min(length(chunk))::BIGINT AS chunk_len
        |FROM ch
        |GROUP BY chunk_md5
        |HAVING count(*) >= 2
        |ORDER BY chunk_md5""".stripMargin,

    // Substring-level dedup (Lee et al. 2021 EXACTSUBSTR shape): 8-token
    // windows repeating >= 2x corpus-wide, merged per doc into maximal
    // spans (windows <= 8 apart touch or overlap). Positions 1-based;
    // span covers tokens [span_start, span_start + span_len).
    "qd23_dup_spans" -> dupSpansSql,

    // Bloom-prefiltered decontamination: the Bloom filter is a map-side
    // prefilter verified by an exact join, so the oracle is the plain
    // eval-overlap screen — 4-token windows via the qd23 positional
    // kernel (see qd24BloomDecontam's K sizing note).
    "qd24_bloom_decontam" ->
      """WITH t AS MATERIALIZED (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents
        |), sh AS MATERIALIZED (
        |  SELECT DISTINCT doc_id,
        |    array_to_string(toks[i::INT:(i + 3)::INT], ' ') AS shingle
        |  FROM t CROSS JOIN unnest(range(1, len(toks) - 4 + 2)) r(i)
        |), ev AS (
        |  SELECT DISTINCT shingle FROM sh WHERE doc_id < 5
        |), hits AS (
        |  SELECT doc_id, count(*)::BIGINT AS n_eval_hits
        |  FROM sh JOIN ev USING (shingle)
        |  WHERE doc_id >= 5
        |  GROUP BY doc_id
        |)
        |SELECT t.doc_id, coalesce(h.n_eval_hits, 0)::BIGINT AS n_eval_hits,
        |  coalesce(h.n_eval_hits, 0) = 0 AS keep
        |FROM t LEFT JOIN hits h USING (doc_id)
        |WHERE t.doc_id >= 5
        |ORDER BY t.doc_id""".stripMargin,

    // The streaming form converges to the identical mark set regardless
    // of batch boundaries (see Replay.streamDupSpans), so it shares the
    // batch oracle verbatim.
    "qs16_stream_dup_spans" -> dupSpansSql,

    // Exact Levenshtein over the (tiny) verified near-dup pair set.
    // The pair surface is the SAME inverted-index graph the engine rides
    // (TextOps.qd17EditDistance joins MinHashLSH.nearDups), so the oracle
    // stays linear-feasible one SF above the gate instead of grinding an
    // all-pairs Jaccard join (the old form needed 17+ min at sf0.1 and a
    // special-cased unbounded re-run past the 600 s sweep budget).
    // INDEPENDENCE BACKSTOP: because oracle and engine share the pair
    // surface, recall loss in that surface is invisible to parity —
    // DedupSpec's planted-pair tests (including the borderline pair at
    // Jaccard exactly 0.8) are the mandatory check for any change to the
    // banding parameters or the verify threshold.
    "qd17_edit_distance" ->
      s"""WITH $shinglePairGraphSql
        |SELECT p.doc_a, p.doc_b,
        |  levenshtein(da.text, db.text)::BIGINT AS edit_dist,
        |  round(1.0 - levenshtein(da.text, db.text)::DOUBLE
        |    / greatest(length(da.text), length(db.text))::DOUBLE, 6) AS edit_sim
        |FROM p
        |JOIN documents da ON p.doc_a = da.doc_id
        |JOIN documents db ON p.doc_b = db.doc_id
        |ORDER BY doc_a, doc_b""".stripMargin,

    // Quantile sketch beside the exact percentile, range-relative bound.
    "q36_approx_percentile" ->
      """SELECT event_type, count(*) AS n,
        | round(quantile_cont(value, 0.5), 4) AS exact_p50,
        | round(min(value), 2) AS vmin,
        | round(max(value), 2) AS vmax,
        | TRUE AS approx_ok
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    // Deterministic systematic sampling within lang strata (hash order,
    // every 5th doc).
    "qd15_stratified_sample" ->
      """SELECT doc_id, lang, source, n_chars, rn::BIGINT AS stratum_rank
        |FROM (
        |  SELECT doc_id, lang, source, n_chars, row_number() OVER (
        |    PARTITION BY lang ORDER BY md5(text), doc_id) AS rn
        |  FROM documents
        |)
        |WHERE rn % 5 = 1
        |ORDER BY doc_id""".stripMargin,

    // Domain-mixture construction: per-source integer quotas filled in
    // content-hash order.
    "qd16_domain_mixture" ->
      """SELECT doc_id, source, n_chars, rn::BIGINT AS mix_rank
        |FROM (
        |  SELECT doc_id, source, n_chars, row_number() OVER (
        |    PARTITION BY source ORDER BY md5(text), doc_id) AS rn,
        |    CASE source WHEN 'src0' THEN 20 WHEN 'src1' THEN 13
        |      WHEN 'src2' THEN 10 WHEN 'src3' THEN 5 WHEN 'src4' THEN 3
        |      ELSE 0 END AS quota
        |  FROM documents
        |)
        |WHERE rn <= quota
        |ORDER BY doc_id""".stripMargin,

    // The §3.2 flagship fact build (stage → rollup → ordered LISTAGG →
    // broadcast left joins → warehouse string render) under the oracle.
    "q35_history_fact" ->
      """WITH staged AS (
        |  SELECT user_id AS id, epoch_us(ts::TIMESTAMP) AS created_at,
        |    event_id AS followers_count,
        |    CASE WHEN event_type = 'view' THEN floor(value * 10)::BIGINT END AS impressions,
        |    CASE WHEN event_type = 'click' THEN floor(value * 10)::BIGINT END AS reach
        |  FROM events
        |), per_user AS (
        |  SELECT id,
        |    coalesce(string_agg(followers_count::VARCHAR, ', '
        |      ORDER BY created_at, followers_count), '') AS followers,
        |    coalesce(string_agg(impressions::VARCHAR, ', '
        |      ORDER BY created_at, impressions), '') AS impressions,
        |    coalesce(string_agg(reach::VARCHAR, ', '
        |      ORDER BY created_at, reach), '') AS reach
        |  FROM staged GROUP BY id
        |), aggs AS (
        |  SELECT user_id AS id, count(*) AS doc_count,
        |    ((abs((sum(value::DECIMAL(20,6)) * 1000000)::BIGINT) * 2
        |       + 100 * count(value)) // (200 * count(value)))::DOUBLE
        |      / 10000 AS fol_avg,
        |    ((abs((sum((value * 2)::DECIMAL(20,6)) * 1000000)::BIGINT) * 2
        |       + 100 * count(value)) // (200 * count(value)))::DOUBLE
        |      / 10000 AS eng_avg
        |  FROM events
        |  WHERE ts::TIMESTAMP >= TIMESTAMP '2024-02-15' - INTERVAL 60 DAY
        |  GROUP BY user_id
        |  ORDER BY doc_count DESC, id
        |  LIMIT 10000
        |), colors AS (
        |  SELECT DISTINCT user_id AS id,
        |    printf('#%06x', user_id % 16777216) AS colors
        |  FROM events
        |)
        |SELECT p.id, p.followers, p.impressions, p.reach,
        |  a.doc_count, a.fol_avg, a.eng_avg, c.colors
        |FROM per_user p
        |LEFT JOIN aggs a ON p.id = a.id
        |LEFT JOIN colors c ON p.id = c.id
        |ORDER BY p.id""".stripMargin,

    // Composed curation pipeline: quality gate → exact dedup → near-dup
    // cluster pruning (reuses q33's recursive-CTE component resolution).
    "qd10_corpus_curation" ->
      s"""WITH RECURSIVE $shinglePairGraphSql, e AS (
        |  SELECT doc_a AS a, doc_b AS b FROM p
        |  UNION SELECT doc_b, doc_a FROM p
        |), r(s, t2) AS (
        |  SELECT a, a FROM (SELECT DISTINCT a FROM e)
        |  UNION
        |  SELECT r.s, e.b FROM r JOIN e ON r.t2 = e.a
        |), drop_members AS (
        |  SELECT s AS doc_id FROM r GROUP BY s HAVING s <> min(t2)
        |), quality AS (
        |  SELECT doc_id, lang, source,
        |    length(text) AS n_chars_actual,
        |    len(string_split_regex(trim(text), '\\s+')) AS n_words,
        |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |  FROM documents
        |  WHERE len(string_split_regex(trim(text), '\\s+')) >= 30
        |    AND length(text) >= 200
        |)
        |SELECT doc_id, lang, source, n_chars_actual, n_words
        |FROM quality
        |WHERE rn = 1
        |  AND doc_id NOT IN (SELECT doc_id FROM drop_members)
        |ORDER BY doc_id""".stripMargin,

    // ONE SQL text serves the batch form and the streaming form (qs27
    // folds its accumulated postings/length/stats state to identical
    // inputs across the batch boundary).
    "qd8_bm25_search" -> bm25Sql,
    "qs27_stream_bm25" -> bm25Sql,

    // Kneser-Ney: one bigram-type table feeds every model quantity
    // (context totals, forward/backward type counts, the type total);
    // the oracle joins on the raw n-gram strings where the engine
    // joins on their xxhash64 pairs — equal joins absent a 128-bit
    // collision, which the hash-compare would expose.
    "qd42_kneser_ney" -> kneserNeySql,
    "qs32_stream_kn" -> kneserNeySql,

    // qd43: the oracle re-induces the capped vocabulary from the same
    // substring statistics and replays the ENTIRE Viterbi lattice as a
    // recursive CTE — positions advance one character per round
    // carrying a 4-slot dp window, so the packed (2²⁰·score − pieces)
    // optimum, the derived best_score/best_pieces pair, and the
    // path-independent vocab_hits all hash-match only when the Spark
    // side's vocabulary gate+cap ordering AND its DP transitions are
    // exactly mirrored.
    "qd43_unigram_segment" -> unigramSegmentSql,
    // qs36 shares qd43's oracle verbatim: the streamed state is one
    // row per doc against the SAME deterministic frozen vocabulary
    "qs36_stream_segment" -> unigramSegmentSql,


    // Unicode cleaning over the deterministically-dirtied derived
    // corpus: chr() builds the exact decoration the engine adds as
    // string literals (decomposed accent pair, BEL, TAB run, trailing
    // blanks, parity é+BEL tail); nfc_normalize mirrors the native
    // graft_nfc expression, the RE2 character classes mirror the Java
    // ones, and both engines clean in the same rule order.
    "qd41_unicode_clean" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    chr(101) || chr(769) || chr(7) || ' ' || text
        |      || chr(9) || '  '
        |      || CASE WHEN doc_id % 2 = 0 THEN chr(233) || chr(7)
        |              ELSE '' END AS dirty
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, length(dirty)::BIGINT AS n_raw,
        |    trim(regexp_replace(regexp_replace(nfc_normalize(dirty),
        |      '[\p{Cc}\p{Cf}]', '', 'g'),
        |      '[ \t\n\r\f\x0B]+', ' ', 'g')) AS clean_text
        |  FROM d
        |)
        |SELECT doc_id, n_raw, clean_text,
        |  length(clean_text)::BIGINT AS n_clean,
        |  (n_raw - length(clean_text))::BIGINT AS n_stripped
        |FROM c
        |ORDER BY doc_id""".stripMargin,

    // Hybrid retrieval: the qd8 BM25 ranking (candidate depth candK)
    // fused by reciprocal-rank fusion with a hashed-TF cosine ranking.
    // ONE SQL text serves the batch form and the streaming form (qs28
    // folds both indices' state to identical inputs across the batch
    // boundary). Constants (RRF k, bucket count, candidate depth)
    // interpolate from the operator's own defaults so a default change
    // fails loudly here.
    "qd40_hybrid_rrf" -> hybridRrfSql,
    "qs28_stream_hybrid" -> hybridRrfSql,

    "qe1_knn_brute_force" ->
      """WITH e AS (
        |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
        |), q AS (
        |  SELECT vec_id AS q_id, v AS q_vec FROM e WHERE vec_id < 5
        |), s AS (
        |  SELECT q_id, e.vec_id AS cand_id, e.label AS cand_label,
        |    round(list_inner_product(q_vec, v)
        |      / (sqrt(list_inner_product(q_vec, q_vec))
        |         * sqrt(list_inner_product(v, v))), 6) AS sim
        |  FROM q CROSS JOIN e WHERE q_id <> e.vec_id
        |), r AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY q_id ORDER BY sim DESC, cand_id) AS rank
        |  FROM s
        |)
        |SELECT q_id, rank, cand_id, cand_label, sim FROM r
        |WHERE rank <= 5
        |ORDER BY q_id, rank""".stripMargin,

    // Banded near-dup pairs: the blocking (label ∧ any sign-bit band
    // collision, adaptive width) is mirrored via the shared CTE prefix,
    // so the oracle computes the IDENTICAL candidate set — the LSH
    // recall trade is part of the operator's contract, not slack.
    "qe2_neardup_pairs" ->
      s"""WITH $bandedBlockSql
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label,
        |  round(list_inner_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS sim
        |FROM w a JOIN w b ON a.label = b.label AND a.vec_id < b.vec_id
        |  AND ($bandMatchSql)
        |WHERE round(list_inner_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= 0.35
        |ORDER BY id_a, id_b""".stripMargin,

    // DBSCAN over the banded ε-graph (shared blocking CTE prefix — the
    // neighborhood relation is the same documented LSH approximation as
    // qe2's, identical in both engines): the recursive CTE resolves
    // core-core components exactly as q33's; borders take the MIN core
    // neighbor's cluster (the engine's deterministic tie-break); the ε
    // and MinPts constants interpolate from the operator's defaults.
    // Seeding r with every core id covers singleton cores (their own
    // cluster), mirroring the engine's coalesce(comp, id).
    // Power-iteration PCA: the whole pipeline (micro quantization →
    // exact integer second moment → 64 generated iteration CTEs →
    // projection) recomputed in SQL. ONE SQL text serves the batch
    // form and the streaming form (qs29 folds its per-batch moment
    // deltas to the identical integer matrix across the boundary).
    "qe18_pca_power" -> pcaPowerSql,
    "qs29_stream_pca" -> pcaPowerSql,
    // Embedding drift: window/lifetime integer mean displacement; one
    // SQL text serves the batch and arrival-time forms.
    "qe21_embedding_drift" -> embDriftSql,
    "qs31_stream_embdrift" -> embDriftSql,

    "qe17_dbscan" ->
      s"""WITH RECURSIVE $bandedBlockSql, p AS MATERIALIZED (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM w a JOIN w b ON a.label = b.label AND a.vec_id < b.vec_id
        |    AND ($bandMatchSql)
        |  WHERE round(list_inner_product(a.v, b.v) / (a.nrm * b.nrm), 6)
        |    >= ${graft.operators.VectorOps.DbscanEps}
        |), n AS (
        |  SELECT id_a AS id, id_b AS nb FROM p
        |  UNION ALL SELECT id_b, id_a FROM p
        |), deg AS (
        |  SELECT id, count(*) AS n_neighbors FROM n GROUP BY 1
        |), core AS (
        |  SELECT id FROM deg
        |  WHERE n_neighbors + 1 >= ${graft.operators.VectorOps.DbscanMinPts}
        |), ces AS (
        |  SELECT id_a AS ea, id_b AS eb FROM p
        |  WHERE id_a IN (SELECT id FROM core) AND id_b IN (SELECT id FROM core)
        |  UNION
        |  SELECT id_b, id_a FROM p
        |  WHERE id_a IN (SELECT id FROM core) AND id_b IN (SELECT id FROM core)
        |), r(s, t2) AS (
        |  SELECT id, id FROM core
        |  UNION
        |  SELECT r.s, ces.eb FROM r JOIN ces ON r.t2 = ces.ea
        |), cc AS (
        |  SELECT s AS id, min(t2) AS cluster FROM r GROUP BY s
        |), border AS (
        |  SELECT n.id, min(cc.cluster) AS cluster
        |  FROM n JOIN cc ON n.nb = cc.id
        |  WHERE n.id NOT IN (SELECT id FROM core)
        |  GROUP BY n.id
        |)
        |SELECT e.vec_id,
        |  CASE WHEN cc.cluster IS NOT NULL THEN 'core'
        |       WHEN border.cluster IS NOT NULL THEN 'border'
        |       ELSE 'noise' END AS role,
        |  coalesce(cc.cluster, border.cluster) AS cluster,
        |  coalesce(deg.n_neighbors, 0) AS n_neighbors
        |FROM e
        |LEFT JOIN deg ON e.vec_id = deg.id
        |LEFT JOIN cc ON e.vec_id = cc.id
        |LEFT JOIN border ON e.vec_id = border.id
        |ORDER BY e.vec_id""".stripMargin,

    // SemDeDup keep-list over the corpus ∪ its perturbed copy (the qs9
    // construction). The oracle reproduces the ENTIRE deterministic
    // pipeline: label-mean centroids over the full union, 6dp-rounded
    // argmax cell assignment (qs12's construction), sign-bit sub-bucket
    // (s = clamp(4, 16, ⌊log2 n⌋ − 7), computed in-SQL from the union
    // count via length(bin(n)) − 1), within-(cell, sub) exact cosine
    // pairs, then a recursive-CTE component resolution (q33's
    // construction) and a left join back to every union document.
    // isfinite guard: degenerate vectors must form no pairs on either
    // side. In DuckDB a 0/0 cosine is NaN and NaN >= t is TRUE
    // (NaN-is-greatest), hence the explicit isfinite. Spark shares the
    // NaN-is-greatest ordering (and additionally THROWS on double 0/0
    // under ANSI mode), so the engine routes zero-norm/NaN vectors
    // around pairing and !isnan-guards its pair filter — the same
    // exclusion, enforced explicitly on both sides.
    // Shared by qe4 (batch) and qs15 (streaming): the stream's frozen
    // quantizer is trained on the same full union, its pair graph is
    // digest-identical, and its final resolution re-minimizes labels
    // over members, so both forms compute this exact result.
    "qe4_semantic_dedup" -> semanticDedupOracle,
    "qe5_semdedup_indexed" -> semanticDedupOracle,
    "qs15_stream_semdedup" -> semanticDedupOracle,


    "qe3_label_stats" ->
      """WITH e AS (
        |  SELECT label, embedding::DOUBLE[] AS v FROM embeddings
        |)
        |SELECT label, count(*) AS n_vecs,
        | round(avg(v[1]), 6) AS dim1_avg,
        | round(avg(sqrt(list_inner_product(v, v))), 6) AS norm_avg
        |FROM e
        |GROUP BY label
        |ORDER BY label""".stripMargin,

    "q20_distinct_agg" ->
      """SELECT l_returnflag,
        | count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps,
        | count(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q21_rollup" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        | coalesce(o_orderpriority, 'ALL') AS priority,
        | count(*) AS n_orders,
        | round(sum((o_totalprice)::DECIMAL(20,6)), 2)::DOUBLE AS revenue
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,

    "q22_window_funcs" ->
      """SELECT user_id, event_id,
        | lag(value, 1) OVER w_time AS prev_value,
        | lead(value, 1) OVER w_time AS next_value,
        | rank() OVER w_value AS value_rank,
        | dense_rank() OVER w_value AS value_dense_rank,
        | ntile(4) OVER w_value AS value_quartile,
        | round(percent_rank() OVER w_value, 6) AS value_pct_rank,
        | round(cume_dist() OVER w_value, 6) AS value_cume_dist,
        | round(sum(value) OVER (PARTITION BY user_id
        |   ORDER BY ts::TIMESTAMP, event_id ROWS UNBOUNDED PRECEDING), 2)
        |   AS running_sum,
        | round(avg(value) OVER (PARTITION BY user_id
        |   ORDER BY ts::TIMESTAMP, event_id
        |   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3
        |FROM events
        |WHERE user_id < 30
        |WINDOW
        | w_time AS (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id),
        | w_value AS (PARTITION BY user_id ORDER BY value DESC, event_id)
        |ORDER BY user_id, event_id""".stripMargin,

    "q23_percentiles" ->
      """SELECT event_type, count(*) AS n,
        | round(quantile_cont(value, 0.5), 4) AS p50,
        | round(quantile_cont(value, 0.9), 4) AS p90,
        | round(min(value), 2) AS vmin,
        | round(max(value), 2) AS vmax,
        | round(stddev_samp(value), 4) AS v_stddev
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q24_asof_enrich" ->
      """SELECT event_id, user_id, event_type, epoch_us(ts::TIMESTAMP) AS ts_us,
        | last_purchase_id, last_purchase_us,
        | epoch_us(ts::TIMESTAMP) - last_purchase_us AS us_since_purchase
        |FROM (
        |  SELECT event_id, user_id, event_type, ts,
        |    last_value(CASE WHEN event_type = 'purchase' THEN event_id END
        |      IGNORE NULLS) OVER w AS last_purchase_id,
        |    last_value(CASE WHEN event_type = 'purchase'
        |      THEN epoch_us(ts::TIMESTAMP) END IGNORE NULLS) OVER w
        |      AS last_purchase_us
        |  FROM events
        |  WHERE user_id < 30
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id
        |    ROWS UNBOUNDED PRECEDING)
        |)
        |ORDER BY event_id""".stripMargin,

    "q26_band_join" ->
      """WITH p AS (
        |  SELECT user_id AS p_user, event_id AS purchase_id,
        |    epoch_us(ts::TIMESTAMP) AS p_us
        |  FROM events WHERE event_type = 'purchase'
        |), e AS (
        |  SELECT user_id AS e_user, event_id AS error_id,
        |    epoch_us(ts::TIMESTAMP) AS e_us
        |  FROM events WHERE event_type = 'error'
        |)
        |SELECT p_user AS user_id, purchase_id, error_id, p_us, e_us
        |FROM p JOIN e ON p_user = e_user AND abs(p_us - e_us) <= 300000000
        |ORDER BY user_id, purchase_id, error_id""".stripMargin,

    "q27_series_aggregator" ->
      """SELECT user_id,
        | string_agg(event_type, ',' ORDER BY ts::TIMESTAMP, event_id) AS type_series
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    "q28_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts::TIMESTAMP) AS t FROM events
        |), u1 AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'signup' THEN t END) AS t_signup
        |  FROM e GROUP BY user_id
        |), u2 AS (
        |  SELECT e.user_id, min(t_signup) AS t_signup,
        |    min(CASE WHEN event_type = 'click' AND t >= t_signup THEN t END) AS t_click
        |  FROM e JOIN u1 ON e.user_id = u1.user_id GROUP BY e.user_id
        |), u3 AS (
        |  SELECT e.user_id, min(t_signup) AS t_signup, min(t_click) AS t_click,
        |    min(CASE WHEN event_type = 'purchase' AND t >= t_click THEN t END) AS t_purchase
        |  FROM e JOIN u2 ON e.user_id = u2.user_id GROUP BY e.user_id
        |)
        |SELECT count(t_signup) AS n_signup,
        |  count(t_click) AS n_signup_click,
        |  count(t_purchase) AS n_full_funnel,
        |  count(*) AS n_users
        |FROM u3""".stripMargin,

    "q29_cohort" ->
      """WITH e AS (
        |  SELECT user_id, strftime(ts::TIMESTAMP, '%Y-%m-%d') AS day FROM events
        |), c AS (
        |  SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id
        |)
        |SELECT cohort_day,
        |  date_diff('day', cohort_day::DATE, day::DATE) AS day_offset,
        |  count(*) AS n_users
        |FROM (SELECT DISTINCT e.user_id, cohort_day, day
        |      FROM e JOIN c ON e.user_id = c.user_id)
        |GROUP BY cohort_day, day_offset
        |ORDER BY cohort_day, day_offset""".stripMargin,

    "q30_pivot" ->
      """SELECT user_id, strftime(ts::TIMESTAMP, '%Y-%m-%d') AS day,
        | count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        | count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        | count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        | count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        | count(CASE WHEN event_type = 'view' THEN 1 END) AS view
        |FROM events
        |GROUP BY user_id, day
        |ORDER BY user_id, day""".stripMargin,

    "q31_scalar_subquery" ->
      """SELECT c_custkey, c_name, round(c_acctbal, 2) AS bal,
        |  (SELECT count(*) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey) AS n_orders
        |FROM customer c
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        |ORDER BY c_custkey""".stripMargin,

    "q32_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        | coalesce(o_orderpriority, 'ALL') AS priority,
        | count(*) AS n_orders,
        | round(sum((o_totalprice)::DECIMAL(20,6)), 2)::DOUBLE AS revenue
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |  (o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin,

    // Streaming incremental dedup: monoidal (min, sum) state fold ==
    // batch exact dedup, so qd1's oracle applies verbatim.
    "qs10_stream_dedup" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id,
        | count(*) AS n_copies
        |FROM documents
        |GROUP BY md5(text)
        |ORDER BY keep_doc_id""".stripMargin,

    // Stateful streaming sessionization == batch q19 (same oracle).
    "qs7_stream_sessionize" ->
      """WITH t AS (
        |  SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) AS ts_us,
        |    lag(epoch_us(ts::TIMESTAMP)) OVER w AS prev_us
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id)
        |), s AS (
        |  SELECT *,
        |    (sum(CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000
        |        THEN 1 ELSE 0 END) OVER (
        |      PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS UNBOUNDED PRECEDING))::BIGINT AS session_id
        |  FROM t
        |)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(ts_us) AS start_us, max(ts_us) AS end_us
        |FROM s
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    // MinHash LSH + exact-shingle-Jaccard verify: at threshold 0.8 the
    // 16-band/4-row S-curve has recall ≥ 0.9998, so the LSH result equals
    // the exact all-pairs answer below.
    "qs1_minhash_neardup" ->
      s"""WITH $shinglePairGraphSql
        |SELECT doc_a, doc_b, jaccard FROM p
        |ORDER BY doc_a, doc_b""".stripMargin,

    // Streaming incremental near-dup == batch qs1 (same pair set, same
    // exact-Jaccard values), so it shares qs1's full SQL recompute.
    "qs13_stream_neardup" ->
      s"""WITH $shinglePairGraphSql
        |SELECT doc_a, doc_b, jaccard FROM p
        |ORDER BY doc_a, doc_b""".stripMargin,

    // Streaming AvailableNow replay must equal the batch recompute:
    // same oracles as q8 / q18.
    "qs5_stream_upsert" ->
      """SELECT user_id, event_id, event_type, epoch_us(ts::TIMESTAMP) AS ts_us
        |FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY user_id
        |    ORDER BY ts::TIMESTAMP DESC, event_id DESC) AS rn
        |  FROM events
        |) WHERE rn = 1
        |ORDER BY user_id""".stripMargin,

    "qs6_stream_hourly" ->
      """SELECT epoch_us(date_trunc('hour', ts::TIMESTAMP)) AS hour_us,
        | event_type, count(*) AS n_events,
        | round(sum((value)::DECIMAL(20,6)), 2)::DOUBLE AS value_sum
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY hour_us, event_type""".stripMargin,
    // Connected components over the near-dup graph; the oracle rebuilds
    // the same graph (exact all-pairs shingle Jaccard ≥ 0.8 — see qs1)
    // and resolves min-reachable representatives with a recursive CTE.
    "q33_dedup_clusters" ->
      s"""WITH RECURSIVE $shinglePairGraphSql, e AS (
        |  SELECT doc_a AS a, doc_b AS b FROM p
        |  UNION SELECT doc_b, doc_a FROM p
        |), r(s, t2) AS (
        |  SELECT a, a FROM (SELECT DISTINCT a FROM e)
        |  UNION
        |  SELECT r.s, e.b FROM r JOIN e ON r.t2 = e.a
        |)
        |SELECT s AS doc_id, min(t2) AS cluster_rep
        |FROM r GROUP BY s
        |ORDER BY doc_id""".stripMargin,

    // SRP-LSH over the corpus plus its deterministic perturbed copy
    // (w_i = 0.95·v_i + 0.05·v_{i+1}, id offset +100000): the expected
    // answer is exactly the n−1 planted pairs at cosine ≈ 0.9986, so the
    // exact all-pairs join over the same derived union is a NON-EMPTY
    // oracle (the earlier corpus-only form passed vacuously on 0 rows).
    "qs9_srp_lsh_neardup" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |), b AS (
        |  SELECT a.vec_id + 100000 AS vec_id,
        |    list_transform(range(1, len(a.v) + 1),
        |      i -> 0.95 * a.v[i] + 0.05 * c.v[i]) AS v
        |  FROM e a JOIN e c ON c.vec_id = a.vec_id + 1
        |), u AS (
        |  SELECT vec_id, v FROM e UNION ALL SELECT vec_id, v FROM b
        |), w AS MATERIALIZED (
        |  -- norms hoisted out of the pair loop (sf0.1+ feasibility):
        |  -- sqrt(dot(v,v)) is per-VECTOR work, and sqrt(a)*sqrt(b) is the
        |  -- bit-identical factorization of the original inline form
        |  SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM u
        |)
        |SELECT id_a, id_b, sim FROM (
        |  SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
        |    round(list_inner_product(a.v, b2.v) / (a.nrm * b2.nrm), 6) AS sim
        |  FROM w a JOIN w b2 ON a.vec_id < b2.vec_id)
        |WHERE sim >= 0.95
        |ORDER BY id_a, id_b""".stripMargin,

    // SimHash is fully SQL-reproducible: the token hash is the lower 64
    // bits of MD5 (DuckDB md5_number_lower, bit-matched by
    // SimHash.md5Lower64String), and the pigeonhole candidate step is
    // exact for Hamming ≤ 3 — so the oracle recomputes fingerprints and
    // all-pairs Hamming from scratch.
    "qs2_simhash_neardup" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents
        |), bits AS (
        |  SELECT doc_id, k,
        |    sum(CASE WHEN (md5_number_lower(tok) >> k) & 1 = 1
        |        THEN 1 ELSE -1 END) AS acc
        |  FROM toks CROSS JOIN range(64) r(k)
        |  GROUP BY doc_id, k
        |), fp AS (
        |  SELECT doc_id,
        |    sum(CASE WHEN acc > 0 THEN (1::UBIGINT << k)
        |        ELSE 0::UBIGINT END)::UBIGINT AS simhash
        |  FROM bits GROUP BY doc_id
        |)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
        |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin,

    // Full-probe IVF == brute force (Ann.knn scaladoc): qe1's oracle
    // without the label column.
    "qs4_ann_ivf" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |), q AS (
        |  SELECT vec_id AS q_id, v AS q_vec FROM e WHERE vec_id < 5
        |), s AS (
        |  SELECT q_id, e.vec_id AS cand_id,
        |    round(list_inner_product(q_vec, v)
        |      / (sqrt(list_inner_product(q_vec, q_vec))
        |         * sqrt(list_inner_product(v, v))), 6) AS sim
        |  FROM q CROSS JOIN e WHERE q_id <> e.vec_id
        |), r AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY q_id ORDER BY sim DESC, cand_id) AS rank
        |  FROM s
        |)
        |SELECT q_id, rank, cand_id, sim FROM r
        |WHERE rank <= 5
        |ORDER BY q_id, rank""".stripMargin,

    // Winnowing is SQL-reproducible because the fingerprint SET equals
    // the distinct sliding-window minima of the md5-based gram hashes
    // (the rightmost-tie rule only affects positions, which the set
    // discards); posting-list pruning (df ≤ 20) and the shared-count
    // threshold mirror Fingerprint.fingerprintCandidates exactly.
    "qs8_winnow_candidates" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, i,
        |    md5_number_lower(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS gh,
        |    len(toks) - 2 AS n_grams
        |  FROM t CROSS JOIN unnest(range(1, greatest(len(toks) - 1, 1))) r(i)
        |  WHERE len(toks) >= 3
        |), wm AS (
        |  SELECT doc_id, i, n_grams,
        |    min(gh) OVER (PARTITION BY doc_id ORDER BY i
        |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin,
        |    min(gh) OVER (PARTITION BY doc_id) AS gmin
        |  FROM g
        |), fp AS (
        |  SELECT DISTINCT doc_id,
        |    CASE WHEN n_grams <= 4 THEN gmin ELSE wmin END AS fp
        |  FROM wm
        |  WHERE n_grams <= 4 OR i <= n_grams - 3
        |), rare AS (
        |  SELECT fp FROM fp GROUP BY fp HAVING count(*) <= 20
        |), pruned AS (
        |  SELECT f.doc_id, f.fp FROM fp f JOIN rare USING (fp)
        |)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared_fps
        |FROM pruned a JOIN pruned b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY doc_a, doc_b
        |HAVING count(*) >= 3
        |ORDER BY doc_a, doc_b""".stripMargin,

    // Exact columns + the 15%-bound (3σ of the 5% rsd) boolean; the
    // sketch's raw value is engine-specific and additionally spec-bounded.
    "q25_approx_distinct" ->
      """SELECT event_type, count(*) AS n_events,
        | count(DISTINCT user_id) AS exact_users,
        | TRUE AS approx_ok
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    // The SEPARABLE palette configuration (Palette.qs11PaletteExact
    // scaladoc): constant-color images, ≤ 5 distinct colors per group →
    // the converged KMeans palette equals the exact color histogram, and
    // the pixel share equals the document-count share (each doc
    // contributes exactly 75×75 pixels; IEEE division of the same two
    // exact integers is bit-equal in both engines).
    "qs11_palette_exact" ->
      """WITH d AS (
        |  SELECT source, ((doc_id // 20) % 5) * 40 + 20 AS cval FROM documents
        |), g AS (
        |  SELECT source, cval, count(*) AS n FROM d GROUP BY source, cval
        |), t AS (
        |  SELECT source, sum(n) AS total FROM g GROUP BY source
        |)
        |SELECT g.source, cval::BIGINT AS red, cval::BIGINT AS green,
        |  cval::BIGINT AS blue,
        |  printf('#%02x%02x%02x', cval, cval, cval) AS hex,
        |  n::DOUBLE / total::DOUBLE AS pct
        |FROM g JOIN t ON g.source = t.source
        |ORDER BY g.source, red""".stripMargin,

    // qm1: n_items/total_bytes are exact integers; duration_avg uses the
    // avg4dp integer formula (duration_ms is integral); f1_avg — the mean
    // share of payload bytes in [0x00,0x10) — is COMPUTED per doc here,
    // and is exactly 0.0 on this control-char-free ASCII corpus in both
    // engines (so the video frame-pooling order, which the spec covers
    // with synthetic payloads, cannot diverge). The populated-bucket
    // integer signal is qm2.
    "qm1_multimodal_features" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'video'
        |      ELSE 'audio' END AS kind,
        |    n_chars::BIGINT AS payload_bytes,
        |    (n_chars * 10)::BIGINT AS duration_ms,
        |    CASE WHEN n_chars = 0 THEN 0.0
        |      ELSE (n_chars - length(regexp_replace(text, '[\x00-\x0f]', '', 'g')))::DOUBLE
        |        / n_chars::DOUBLE END AS f1
        |  FROM documents
        |)
        |SELECT kind, count(*) AS n_items,
        |  sum(payload_bytes)::BIGINT AS total_bytes,
        |  round(avg(f1), 6) AS f1_avg,
        |  ((abs((sum(duration_ms::DECIMAL(20,6)) * 1000000)::BIGINT) * 2
        |     + 100 * count(duration_ms)) // (200 * count(duration_ms)))::DOUBLE
        |    / 10000 AS duration_avg
        |FROM m GROUP BY kind ORDER BY kind""".stripMargin,

    // qm2: exact-integer byte-class rollup through the same sampling
    // geometry as the feature extractor — videos inspect only the
    // stride-4 sampled 64-byte frames (positions i with (i-1)//64 ≡ 0
    // mod 4), images/audio the whole payload. ASCII corpus ⇒ char
    // position == byte position (TESTDATA: octet_length == n_chars).
    "qm2_media_byteclass" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'video'
        |      ELSE 'audio' END AS kind,
        |    text, n_chars::BIGINT AS len
        |  FROM documents
        |), nv AS (
        |  SELECT kind, doc_id, len, len AS sampled,
        |    (len - length(regexp_replace(text, '[\x20-\x2f]', '', 'g')))::BIGINT AS punct
        |  FROM m WHERE kind <> 'video'
        |), v AS (
        |  SELECT kind, doc_id, len, count(*)::BIGINT AS sampled,
        |    sum(CASE WHEN ascii(substr(text, i::INT, 1)) BETWEEN 32 AND 47
        |      THEN 1 ELSE 0 END)::BIGINT AS punct
        |  FROM m CROSS JOIN unnest(range(1, len + 1)) r(i)
        |  WHERE kind = 'video' AND ((i - 1) // 64) % 4 = 0
        |  GROUP BY kind, doc_id, len
        |), v0 AS (
        |  SELECT kind, doc_id, len, 0::BIGINT AS sampled, 0::BIGINT AS punct
        |  FROM m WHERE kind = 'video' AND len = 0
        |)
        |SELECT kind, count(*) AS n_items, sum(len)::BIGINT AS total_bytes,
        |  sum(sampled)::BIGINT AS sampled_bytes, sum(punct)::BIGINT AS punct_bytes
        |FROM (SELECT * FROM nv UNION ALL SELECT * FROM v UNION ALL SELECT * FROM v0) u
        |GROUP BY kind ORDER BY kind""".stripMargin,

    // qm3: the video fixture is deterministic (2 + doc_id % 3 solid
    // 32x24 frames painted from the doc's text bytes, MJPEG-in-AVI),
    // so every output column is SQL-predictable — but on the Spark
    // side each value comes out of the REAL RIFF walk + ImageIO JPEG
    // decode, and luma_ok compares decoded mean luma per frame against
    // the painted color's Rec.601 luma within LumaTol. The hash only
    // matches when the codec round-trips: a broken container walk
    // changes decoded_frames, a broken decode trips luma_ok or the
    // geometry columns. (The codec itself is not SQL-expressible; its
    // absolute outputs are golden-tested in MultimodalSpec.)
    // qm4: the 9×8 banded-PNG fixture makes the dHash exactly
    // SQL-predictable (ASCII corpus: ascii() = the byte the kernel
    // paints; PNG is lossless; grayscale and box-average are integer),
    // while the Spark side produces every bit from a REAL ImageIO
    // encode→decode round trip — the hash only matches when the codec
    // and the 9×8 downsample are faithful.
    "qm4_image_phash_dedup" -> phashSql,
    "qs24_stream_phash" -> phashSql,

    // qm6: the multimodal flagship keep-list — every gate's verdict per
    // document plus the conjunction. Composes qd10's recursive-CTE
    // near-dup closure and qm4's factored dHash chain VERBATIM, so the
    // composed oracle can only pass when each constituent gate matches
    // its standalone form. Exact-dup rank runs over ALL rows here
    // (identical text ⇒ identical quality metrics, so the order of the
    // quality and exact gates cannot change the kept set vs qd10).
    "qm6_multimodal_curation" -> multimodalCurationSql,
    "qs26_stream_curation" -> multimodalCurationSql,

    // qm5: WAV is lossless and every feature is integer arithmetic, so
    // the oracle recomputes sample count / peak / total amplitude /
    // zero crossings in closed form from ascii() of the text — the
    // Spark side produces them from a REAL RIFF/WAVE chunk walk +
    // PCM16LE sample decode; an endianness or offset bug scrambles
    // every feature.
    "qm5_audio_features" -> audioFeaturesSql,
    "qs30_stream_audio" -> audioFeaturesSql,

    "qm7_mp4_metadata" -> mp4MetadataSql,
    "qs34_stream_mp4" -> mp4MetadataSql,

    // qm11: the seek plan is a pure integer function of the document
    // row; the oracle rebuilds the §8.7.4 sample→chunk mapping (two-run
    // stsc expansion with a partial final chunk) and the §8.7.5 offset
    // arithmetic (chunk base + intra-chunk predecessor-size prefix sum)
    // in SQL, one row per stss keyframe — any off-by-one in the
    // engine's demuxer walk shifts a file_offset and breaks the hash.
    "qm11_keyframe_ranges" ->
      """WITH a AS (
        |  SELECT doc_id, 5 + doc_id % 6 AS n, 1 + doc_id % 3 AS k,
        |         1 + doc_id % 2 AS s1, 2 + (doc_id // 3) % 2 AS s2
        |  FROM documents WHERE doc_id % 3 = 1
        |), s AS (
        |  SELECT doc_id, k, s1, s2, r.i + 1 AS sn,
        |    (100 + (doc_id + 7 * r.i) % 50)::BIGINT AS sz
        |  FROM a CROSS JOIN unnest(range(0, n)) r(i)
        |), c AS (
        |  SELECT *, CASE WHEN sn <= s1 THEN 1
        |                 ELSE 2 + (sn - s1 - 1) // s2 END AS chunk
        |  FROM s
        |), o AS (
        |  SELECT *, coalesce(SUM(sz) OVER (
        |      PARTITION BY doc_id, chunk ORDER BY sn
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS intra
        |  FROM c
        |)
        |SELECT doc_id AS media_id, sn::BIGINT AS sample_number,
        |  (4096 + (chunk - 1) * 8192 + intra)::BIGINT AS file_offset,
        |  sz AS sample_bytes
        |FROM o WHERE (sn - 1) % k = 0
        |ORDER BY media_id, sample_number""".stripMargin,

    // qm13: qm11's plan DRIVEN through the deterministic ranged-GET
    // transport (byte i of a range = (offset + i) mod 251), so each
    // payload checksum is a pure integer function of the planned
    // (offset, length) — the oracle rebuilds the chunk mapping like
    // qm11 and folds the mod-251 position sum per range; any drift in
    // what was actually fetched shifts the sum and breaks the hash.
    "qm13_ranged_fetch" ->
      """WITH a AS (
        |  SELECT doc_id, 5 + doc_id % 6 AS n, 1 + doc_id % 3 AS k,
        |         1 + doc_id % 2 AS s1, 2 + (doc_id // 3) % 2 AS s2
        |  FROM documents WHERE doc_id % 3 = 1
        |), s AS (
        |  SELECT doc_id, k, s1, s2, r.i + 1 AS sn,
        |    (100 + (doc_id + 7 * r.i) % 50)::BIGINT AS sz
        |  FROM a CROSS JOIN unnest(range(0, n)) r(i)
        |), c AS (
        |  SELECT *, CASE WHEN sn <= s1 THEN 1
        |                 ELSE 2 + (sn - s1 - 1) // s2 END AS chunk
        |  FROM s
        |), o AS (
        |  SELECT *, coalesce(SUM(sz) OVER (
        |      PARTITION BY doc_id, chunk ORDER BY sn
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS intra
        |  FROM c
        |), f AS (
        |  SELECT doc_id, sn, 4096 + (chunk - 1) * 8192 + intra AS off, sz
        |  FROM o WHERE (sn - 1) % k = 0
        |)
        |SELECT doc_id AS media_id, sn::BIGINT AS sample_number,
        |  off::BIGINT AS file_offset, sz AS sample_bytes,
        |  sz AS content_length,
        |  (SELECT sum((off + r2.j) % 251)
        |   FROM unnest(range(0, sz)) r2(j))::BIGINT AS checksum
        |FROM f ORDER BY media_id, sample_number""".stripMargin,

    // qm14: the decoded I_PCM planes are a pure byte model of the
    // document row ((id + 7·(384·mb + j)) mod 256 at PCM payload index
    // j), but the ENGINE only sees them through the full demux+decode
    // chain — avcC parameter sets, seek plan into a real mdat,
    // length-prefixed NAL, slice-header walk, alignment bits, EP
    // removal, §6.4.1 tile placement. The oracle re-derives every
    // plane sample at its raster position (macroblock index and
    // intra-tile offset recomputed from x/y), so the position-weighted
    // checksum breaks on any single misplaced or misread byte.
    "qm14_pcm_decode" ->
      """WITH v AS (
        |  SELECT doc_id, 1 + doc_id % 3 AS wmb, 1 + doc_id % 2 AS hmb,
        |         16 * (1 + doc_id % 3) AS w, 16 * (1 + doc_id % 2) AS h
        |  FROM documents WHERE doc_id % 3 = 1
        |), luma AS (
        |  SELECT doc_id,
        |    SUM((doc_id + 7 * (384 * ((r.i // w // 16) * wmb + (r.i % w) // 16)
        |         + ((r.i // w) % 16) * 16 + (r.i % w) % 16)) % 256) AS luma_sum,
        |    SUM(((r.i % 97) + 1) *
        |        ((doc_id + 7 * (384 * ((r.i // w // 16) * wmb + (r.i % w) // 16)
        |         + ((r.i // w) % 16) * 16 + (r.i % w) % 16)) % 256))
        |      AS luma_checksum
        |  FROM v CROSS JOIN unnest(range(0, w * h)) r(i)
        |  GROUP BY doc_id
        |), chroma AS (
        |  SELECT doc_id,
        |    SUM((doc_id + 7 * (384 * ((r.i // (w // 2) // 8) * wmb
        |         + (r.i % (w // 2)) // 8) + 256
        |         + ((r.i // (w // 2)) % 8) * 8 + (r.i % (w // 2)) % 8)) % 256)
        |      AS cb_sum,
        |    SUM((doc_id + 7 * (384 * ((r.i // (w // 2) // 8) * wmb
        |         + (r.i % (w // 2)) // 8) + 320
        |         + ((r.i // (w // 2)) % 8) * 8 + (r.i % (w // 2)) % 8)) % 256)
        |      AS cr_sum
        |  FROM v CROSS JOIN unnest(range(0, (w // 2) * (h // 2))) r(i)
        |  GROUP BY doc_id
        |)
        |SELECT v.doc_id AS media_id, w::BIGINT AS width, h::BIGINT AS height,
        |  (wmb * hmb)::BIGINT AS n_mbs, (v.doc_id % 16)::BIGINT AS idr_pic_id,
        |  luma_sum::BIGINT AS luma_sum, cb_sum::BIGINT AS cb_sum,
        |  cr_sum::BIGINT AS cr_sum, luma_checksum::BIGINT AS luma_checksum
        |FROM v JOIN luma USING (doc_id) JOIN chroma USING (doc_id)
        |ORDER BY media_id""".stripMargin,

    // qm15: the qm4 dHash family applied to qm14's DECODED keyframe —
    // the oracle regenerates the luma plane from the byte model, folds
    // the identical (9x÷W, 8y÷H) integer box-average grid, and derives
    // the 64-bit gradient hash + the duplicate window; the engine can
    // only reproduce it by decoding the real bitstream and averaging
    // the same cells (floor division mirrored on both sides).
    "qm15_keyframe_thumb" ->
      """WITH v AS (
        |  SELECT doc_id, 1 + doc_id % 3 AS wmb,
        |         16 * (1 + doc_id % 3) AS w, 16 * (1 + doc_id % 2) AS h
        |  FROM documents WHERE doc_id % 3 = 1
        |), p AS (
        |  SELECT doc_id,
        |    (9 * (r.i % w)) // w AS gx, (8 * (r.i // w)) // h AS gy,
        |    (doc_id + 7 * (384 * ((r.i // w // 16) * wmb + (r.i % w) // 16)
        |     + ((r.i // w) % 16) * 16 + (r.i % w) % 16)) % 256 AS val
        |  FROM v CROSS JOIN unnest(range(0, w * h)) r(i)
        |), c AS (
        |  SELECT doc_id, gx, gy, SUM(val) // COUNT(*) AS gv
        |  FROM p GROUP BY doc_id, gx, gy
        |), b AS (
        |  SELECT a.doc_id, a.gy, a.gx,
        |    CASE WHEN n.gv > a.gv THEN '1' ELSE '0' END AS bit
        |  FROM c a JOIN c n ON n.doc_id = a.doc_id AND n.gy = a.gy
        |    AND n.gx = a.gx + 1
        |  WHERE a.gx < 8
        |), hh AS (
        |  SELECT doc_id AS media_id,
        |    string_agg(bit, '' ORDER BY gy, gx) AS dhash
        |  FROM b GROUP BY doc_id
        |)
        |SELECT media_id, dhash,
        |  min(media_id) OVER (PARTITION BY dhash) AS dup_rep,
        |  media_id <> min(media_id) OVER (PARTITION BY dhash) AS is_dup
        |FROM hh ORDER BY media_id""".stripMargin,

    // qm16: the oracle replays the FULL IMA ADPCM encoder+decoder state
    // machine (quantizer, closed-loop reconstruction, both saturating
    // clamps, 65-sample block resets) as a recursive CTE over qm5's
    // sample model — the hash only matches when every state transition
    // on the Spark side (AdpcmCodec) is bit-faithful.
    "qm16_adpcm_roundtrip" ->
      """WITH RECURSIVE a AS (
        |  SELECT doc_id, text, n_chars,
        |    (64 + 16 * (doc_id % 5))::BIGINT AS n
        |  FROM documents WHERE doc_id % 3 = 2 AND n_chars >= 1
        |), s AS (
        |  SELECT doc_id, n, r.i,
        |    ((ascii(substr(text, (r.i % greatest(n_chars, 1))::INT + 1, 1)) - 96)
        |      * 256)::BIGINT AS s
        |  FROM a CROSS JOIN unnest(range(0, n)) r(i)
        |), st AS (
        |  SELECT doc_id, 0::BIGINT AS j, s AS pred, 0::BIGINT AS idx, s AS dec
        |  FROM s WHERE i = 0
        |  UNION ALL
        |  SELECT doc_id, j,
        |    CASE WHEN hdr THEN sj ELSE predn END AS pred,
        |    CASE WHEN hdr THEN 0 ELSE idxn END AS idx,
        |    CASE WHEN hdr THEN sj ELSE predn END AS dec
        |  FROM (
        |    SELECT x.doc_id, x.j, x.hdr, x.sj,
        |      greatest(-32768, least(32767,
        |        x.pred + CASE WHEN x.sign THEN -x.delta ELSE x.delta END)) AS predn,
        |      greatest(0, least(88,
        |        x.idx + ([-1,-1,-1,-1,2,4,6,8])[x.nib3 + 1])) AS idxn
        |    FROM (
        |      SELECT w.*,
        |        w.step // 8 + CASE WHEN w.b4 THEN w.step ELSE 0 END
        |          + CASE WHEN w.b2 THEN w.step // 2 ELSE 0 END
        |          + CASE WHEN w.b1 THEN w.step // 4 ELSE 0 END AS delta,
        |        (CASE WHEN w.b4 THEN 4 ELSE 0 END
        |          + CASE WHEN w.b2 THEN 2 ELSE 0 END
        |          + CASE WHEN w.b1 THEN 1 ELSE 0 END) AS nib3
        |      FROM (
        |        SELECT v.*, v.d3 >= v.step // 4 AS b1
        |        FROM (
        |          SELECT u.*, u.d2 >= u.step // 2 AS b2,
        |            u.d2 - CASE WHEN u.d2 >= u.step // 2 THEN u.step // 2 ELSE 0 END AS d3
        |          FROM (
        |            SELECT t.*, t.d >= t.step AS b4,
        |              t.d - CASE WHEN t.d >= t.step THEN t.step ELSE 0 END AS d2
        |            FROM (
        |              SELECT st.doc_id, st.j + 1 AS j, st.pred, st.idx,
        |                s.s AS sj, (st.j + 1) % 65 = 0 AS hdr,
        |                s.s < st.pred AS sign, abs(s.s - st.pred) AS d,
        |                ([7,8,9,10,11,12,13,14,16,17,19,21,23,25,28,31,34,37,41,45,
        |                  50,55,60,66,73,80,88,97,107,118,130,143,158,173,190,209,
        |                  230,253,279,307,337,371,408,449,494,544,598,658,724,796,
        |                  876,963,1060,1166,1282,1411,1552,1707,1878,2066,2272,2499,
        |                  2749,3024,3327,3660,4026,4428,4871,5358,5894,6484,7132,
        |                  7845,8630,9493,10442,11487,12635,13899,15289,16818,18500,
        |                  20350,22385,24623,27086,29794,32767])[st.idx + 1] AS step
        |              FROM st JOIN s ON s.doc_id = st.doc_id AND s.i = st.j + 1
        |            ) t
        |          ) u
        |        ) v
        |      ) w
        |    ) x
        |  )
        |), f AS (
        |  SELECT st.doc_id,
        |    count(*)::BIGINT AS n_samples,
        |    sum(st.dec)::BIGINT AS sum_dec,
        |    max(abs(st.dec))::BIGINT AS peak_dec,
        |    sum(abs(st.dec - s.s))::BIGINT AS err_abs
        |  FROM st JOIN s ON s.doc_id = st.doc_id AND s.i = st.j
        |  GROUP BY st.doc_id
        |)
        |SELECT doc_id AS media_id, n_samples,
        |  ((n_samples + 64) // 65)::BIGINT AS n_blocks,
        |  (((n_samples + 64) // 65) * 36)::BIGINT AS compressed_bytes,
        |  sum_dec, peak_dec, err_abs
        |FROM f ORDER BY media_id""".stripMargin,

    // qm17: the oracle replays the post-entropy arithmetic chain in
    // closed form — inverse zigzag + two-sided Hadamard (the ±1 matrix
    // as a flat list literal), the §8.5.10 rounded dequant (explicit
    // floor division: DuckDB // truncates toward zero), the DC-only
    // flat residual, the §8.3.3 prediction recursion down the
    // macroblock column, and Clip1. The CAVLC layer has no shortcut
    // here: the Spark side recovers these coefficients ONLY by bit-
    // level entropy decode of its own stream, so total_coeff and every
    // pixel feature hash-match only when each coefficient survives the
    // encode→decode round trip at its exact zigzag position.
    // qm18: see acDecodeSql — the full inverse-core-transform mirror
    "qm18_ac_transform" -> acDecodeSql,
    // qm19: see chromaDecodeSql — the chroma-DC half of the family
    "qm19_chroma_decode" -> chromaDecodeSql,

    "qm17_cavlc_decode" ->
      """WITH RECURSIVE a AS (
        |  SELECT doc_id, (1 + doc_id % 4)::BIGINT AS n_mbs,
        |         (20 + doc_id % 10)::BIGINT AS qp
        |  FROM documents WHERE doc_id % 3 = 1
        |), cz AS (
        |  SELECT a.doc_id, a.n_mbs, a.qp, m.m, z.z,
        |    (CASE WHEN ((a.doc_id + 5*(16*m.m + z.z)) % 11) < 4 THEN 0
        |          ELSE ((a.doc_id + 5*(16*m.m + z.z)) % 11) - 7 END)::BIGINT AS c
        |  FROM a
        |  CROSS JOIN unnest(range(0, a.n_mbs)) m(m)
        |  CROSS JOIN unnest(range(0, 16)) z(z)
        |), tcn AS (
        |  SELECT doc_id, (count(*) FILTER (c <> 0))::BIGINT AS total_coeff
        |  FROM cz GROUP BY doc_id
        |), f AS (
        |  SELECT cz.doc_id, cz.n_mbs, cz.qp, cz.m, g.r, g.cc,
        |    sum(cz.c
        |      * ([1,1,1,1, 1,1,-1,-1, 1,-1,-1,1, 1,-1,1,-1])
        |          [g.r*4 + ([0,1,4,8,5,2,3,6,9,12,13,10,7,11,14,15])[cz.z+1] // 4 + 1]
        |      * ([1,1,1,1, 1,1,-1,-1, 1,-1,-1,1, 1,-1,1,-1])
        |          [g.cc*4 + ([0,1,4,8,5,2,3,6,9,12,13,10,7,11,14,15])[cz.z+1] % 4 + 1]
        |    )::BIGINT AS f
        |  FROM cz CROSS JOIN (
        |    SELECT r.r, cc.cc
        |    FROM unnest(range(0, 4)) r(r) CROSS JOIN unnest(range(0, 4)) cc(cc)
        |  ) g
        |  GROUP BY cz.doc_id, cz.n_mbs, cz.qp, cz.m, g.r, g.cc
        |), d0 AS (
        |  SELECT doc_id, n_mbs, qp, m, r, cc,
        |    f * ([160,176,208,224,256,288])[qp % 6 + 1]
        |      + CASE WHEN qp >= 24 THEN 2 ELSE 4 END AS num,
        |    CASE WHEN qp >= 24 THEN 4 ELSE 8 END AS den
        |  FROM f
        |), d1 AS (
        |  SELECT doc_id, n_mbs, qp, m, r, cc,
        |    (num - ((num % den) + den) % den) // den + 32 AS v
        |  FROM d0
        |), d AS (
        |  SELECT doc_id, n_mbs, qp, m, r, cc,
        |    (v - ((v % 64) + 64) % 64) // 64 AS res
        |  FROM d1
        |), b AS (
        |  SELECT doc_id, m,
        |    max(CASE WHEN cc = 0 THEN res END) AS r0,
        |    max(CASE WHEN cc = 1 THEN res END) AS r1,
        |    max(CASE WHEN cc = 2 THEN res END) AS r2,
        |    max(CASE WHEN cc = 3 THEN res END) AS r3
        |  FROM d WHERE r = 3 GROUP BY doc_id, m
        |), p AS (
        |  SELECT doc_id, 0::BIGINT AS m, 128::BIGINT AS pred, n_mbs FROM a
        |  UNION ALL
        |  SELECT p.doc_id, p.m + 1,
        |    ((4*( greatest(0, least(255, p.pred + b.r0))
        |        + greatest(0, least(255, p.pred + b.r1))
        |        + greatest(0, least(255, p.pred + b.r2))
        |        + greatest(0, least(255, p.pred + b.r3)) ) + 8) // 16)::BIGINT,
        |    p.n_mbs
        |  FROM p JOIN b ON b.doc_id = p.doc_id AND b.m = p.m
        |  WHERE p.m + 1 < p.n_mbs
        |), px AS (
        |  SELECT d.doc_id, d.n_mbs, d.qp, d.m, d.r, d.cc,
        |    greatest(0, least(255, p.pred + d.res))::BIGINT AS v
        |  FROM d JOIN p ON p.doc_id = d.doc_id AND p.m = d.m
        |), wv AS (
        |  SELECT px.doc_id, px.n_mbs, px.qp, px.m, px.r, px.cc, px.v,
        |    sum((((px.m*16 + px.r*4 + rw.rw) * 16 + px.cc*4 + cl.cl) % 97) + 1)
        |      ::BIGINT AS wsum
        |  FROM px
        |  CROSS JOIN unnest(range(0, 4)) rw(rw)
        |  CROSS JOIN unnest(range(0, 4)) cl(cl)
        |  GROUP BY px.doc_id, px.n_mbs, px.qp, px.m, px.r, px.cc, px.v
        |)
        |SELECT wv.doc_id AS media_id, wv.n_mbs, wv.qp, tcn.total_coeff,
        |  sum(16 * wv.v)::BIGINT AS luma_sum,
        |  min(wv.v)::BIGINT AS luma_min,
        |  max(wv.v)::BIGINT AS luma_max,
        |  sum(wv.v * wv.wsum)::BIGINT AS luma_checksum
        |FROM wv JOIN tcn ON tcn.doc_id = wv.doc_id
        |GROUP BY wv.doc_id, wv.n_mbs, wv.qp, tcn.total_coeff
        |ORDER BY media_id""".stripMargin,

    // qm10: the sample plan is a pure integer function of the document
    // row — duration_units folds the two-run stts decode ((n−2)·d +
    // 2·2d), n_keyframes the every-k stss schedule, and the byte
    // profile the per-sample stsz table the oracle regenerates with a
    // range() unnest.
    "qm10_mp4_samples" ->
      """WITH a AS (
        |  SELECT doc_id, 5 + doc_id % 6 AS n, 3000 + 10 * (doc_id % 4) AS d,
        |         1 + doc_id % 3 AS k
        |  FROM documents WHERE doc_id % 3 = 1
        |), s AS (
        |  SELECT doc_id, (100 + (doc_id + 7 * r.i) % 50)::BIGINT AS sz
        |  FROM a CROSS JOIN unnest(range(0, n)) r(i)
        |), agg AS (
        |  SELECT doc_id, sum(sz) AS tot, max(sz) AS mx FROM s GROUP BY doc_id
        |)
        |SELECT a.doc_id AS media_id,
        |  n::BIGINT AS n_samples,
        |  ((n + 2) * d)::BIGINT AS duration_units,
        |  ((n + k - 1) // k)::BIGINT AS n_keyframes,
        |  agg.tot::BIGINT AS total_sample_bytes,
        |  agg.mx::BIGINT AS max_sample_bytes
        |FROM a JOIN agg ON agg.doc_id = a.doc_id
        |ORDER BY media_id""".stripMargin,

    // qm12: every ASC field is a pure integer function of the document
    // row; the engine can only reproduce them by round-tripping a real
    // ES_Descriptor chain (base-128 expandable lengths, both layouts)
    // through the mp4a entry and unpacking the 5/4/4-bit ASC. The
    // sample_rate column pins the ISO 14496-3 index table; the
    // container_bytes column pins the full writer layout (212 fixed
    // bytes single-byte lengths, 224 padded, + the document's UTF-8
    // bytes riding in the skip box).
    "qm12_aac_config" ->
      """SELECT doc_id AS media_id,
        |  64::BIGINT AS object_type,
        |  (1 + doc_id % 2)::BIGINT AS audio_object_type,
        |  (3 + doc_id % 9)::BIGINT AS freq_index,
        |  (CASE (3 + doc_id % 9)
        |     WHEN 3 THEN 48000 WHEN 4 THEN 44100 WHEN 5 THEN 32000
        |     WHEN 6 THEN 24000 WHEN 7 THEN 22050 WHEN 8 THEN 16000
        |     WHEN 9 THEN 12000 WHEN 10 THEN 11025
        |     ELSE 8000 END)::BIGINT AS sample_rate,
        |  (1 + doc_id % 6)::BIGINT AS channels,
        |  (8000 * (1 + doc_id % 24))::BIGINT AS avg_bitrate,
        |  (CASE WHEN (doc_id // 2) % 2 = 1 THEN 224 ELSE 212 END
        |   + octet_length(encode(text)))::BIGINT AS container_bytes
        |FROM documents WHERE doc_id % 3 = 1
        |ORDER BY media_id""".stripMargin,

    // qm9: profile/level/display-size are pure integer functions of the
    // document row; the engine can only reproduce them by round-tripping
    // a real Exp-Golomb SPS through the avcC box stack (width/height
    // fold the §7.4.2.1.1 crop arithmetic: coded macroblock size minus
    // 2 px per crop unit at 4:2:0).
    "qm9_h264_dimensions" ->
      """SELECT doc_id AS media_id,
        |  (CASE WHEN (doc_id // 2) % 2 = 0 THEN 66 ELSE 100 END)::BIGINT
        |    AS profile_idc,
        |  (30 + doc_id % 3)::BIGINT AS level_idc,
        |  (16 * (1 + doc_id % 8) - 2 * (doc_id % 5))::BIGINT AS width,
        |  (16 * (1 + doc_id % 6) - 2 * (doc_id % 4))::BIGINT AS height
        |FROM documents WHERE doc_id % 3 = 1
        |ORDER BY media_id""".stripMargin,

    // qm8: like qm7, the synthesized MP3/ADTS streams' parameters are
    // pure integer functions of the document row, recomputed in closed
    // form — the stream_bytes column folds the Layer III length formula
    // (144000·br/sr per frame + one padding byte per odd frame index,
    // after the 10-byte ID3 header + the document's bytes in the tag)
    // and the ADTS per-frame length (7-byte header + 1 + id mod 7
    // payload), so the hash matches only when the engine's frame walk
    // strides those exact lengths.
    "qm8_mp3_adts_metadata" -> mp3AdtsSql,
    "qs35_stream_mpeg_audio" -> mp3AdtsSql,

    "qm3_video_frames" ->
      """SELECT doc_id AS media_id,
        |  (2 + doc_id % 3)::BIGINT AS header_frames,
        |  (2 + doc_id % 3)::BIGINT AS decoded_frames,
        |  '32x24' AS header_dims,
        |  32::BIGINT AS frame_w, 24::BIGINT AS frame_h,
        |  true AS luma_ok
        |FROM documents WHERE doc_id % 3 = 1 AND n_chars >= 3
        |ORDER BY media_id""".stripMargin,

    // The REAL low-probe IVF configuration (nprobe = 2 of 10 cells):
    // every stage is deterministic — per-(cell,dim) label means, argmax
    // assignment and probe ranking over 6dp-ROUNDED centroid cosines
    // (ties → lowest cell), exact 6dp cosine within probed cells (ties →
    // cand_id). The 6dp pre-round makes the discrete cell decisions
    // immune to summation-order noise in the means; candidate sims use
    // raw vectors only (qe1-proven bit parity).
    "qs12_ann_lowprobe" -> annLowProbeOracle,

    // qe7: recall@5 of the nprobe=2 IVF search vs exact brute-force
    // ground truth on the vec_id % 25 = 0 query sample — both pipelines
    // (the qs12 low-probe CTEs and the qe1 brute-force ranking) mirrored
    // with the family's 6dp-round-before-rank / lowest-cand-id ties.
    // PQ-ADC top-k: label-mean sub-centroids per 16-dim sub-space,
    // 6dp-rounded argmin encoding (ties to the lowest code), ADC as an
    // exact integer micro-unit sum (order-free), rank by (adc_us,
    // cand_id). d2 is expressed through list_inner_product — the
    // primitive already proven bit-equal to the engine's dot fold.
    "qe8_pq_topk" -> pqSql,
    "qe8_pq_topk_cap8" -> pqSqlAt(8),
    // IVF-PQ composition: qs12's probe CTEs restrict qe8's integer ADC
    // ranking to each query's nprobe=2 cells
    "qe9_ivfpq_topk" -> ivfPqSql,
    // streaming ingest into the CELL-PARTITIONED codes index folds to
    // the identical ranking (one SQL text serves both keys)
    "qs20_stream_ivfpq" -> ivfPqSql,
    // streaming incremental form: per-batch frozen-codebook encode into
    // an append-only codes index folds to the identical ranking (one SQL
    // text serves both keys — divergence fails the gate)
    "qs18_stream_pq" -> pqSql,

    // IVF-PQ with RESIDUAL encoding: the corpus is PQ-encoded as
    // residuals against the assigned coarse centroid (6dp per
    // component), the codebook is the label-mean quantizer over
    // residual sub-vectors, and each query builds a LUT per PROBED
    // cell from its own residual against that cell — candidates rank
    // by the integer ADC sum within probed cells only.
    "qe10_ivfpq_residual" -> resPqSql,

    // SQ8 scalar quantization: per-dimension [min, max] affine map to
    // 8-bit codes (((v - mn) * 255) / (mx - mn), round half-up — the
    // identical left-associated double expression Spark computes;
    // degenerate dims code to 0 with weight 0), capped query sample,
    // ranking by the quantized symmetric L2 distance — the exact
    // INTEGER sum over dims of w_d * (qc - cc)^2 with
    // w_d = round(((mx - mn)/255)^2 * 1e12) pico-units. Ascending,
    // self excluded, ties to the lowest cand_id.
    "qe11_sq_topk" -> sqSql,
    // streaming incremental form: frozen ranges, per-batch zero-shuffle
    // encode into the append-only codes index — one SQL text serves
    // both keys (divergence fails the gate)
    "qs23_stream_sq" -> sqSql,

    // Matryoshka two-stage retrieval: coarse rank the whole corpus by
    // cosine over the FIRST 16 components only, keep top-50 per query,
    // rerank the survivors by full 64-dim cosine. Both stages 6dp-round
    // before ranking, ties to the lowest cand_id, self excluded.
    "qe12_truncated_rerank" -> truncSql,

    // qe15: k generated greedy MMR steps over the exact top-c stage —
    // every constant interpolates from Ann's own defaults
    "qe15_mmr_topk" -> mmrSql(Ann.DefaultTopK, Ann.DefaultMmrCandidates,
      Ann.DefaultMmrLambdaPct),
    // ONE SQL text serves the batch form and the streaming form (qs33
    // runs the identical trace over the accumulated vector index)
    "qs33_stream_mmr" -> mmrSql(Ann.DefaultTopK, Ann.DefaultMmrCandidates,
      Ann.DefaultMmrLambdaPct),

    "qe7_ann_recall" ->
      """WITH e AS (
        |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
        |), comp AS (
        |  SELECT label AS cell, i AS dim, avg(v[i::INT]) AS m
        |  FROM e CROSS JOIN unnest(range(1, len(v) + 1)) r(i)
        |  GROUP BY label, i
        |), cents AS (
        |  SELECT cell, list(m ORDER BY dim) AS centroid FROM comp GROUP BY cell
        |), assign AS (
        |  SELECT vec_id, cell, v FROM (
        |    SELECT e.vec_id, c.cell, e.v,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        round(list_inner_product(e.v, c.centroid)
        |          / (sqrt(list_inner_product(e.v, e.v))
        |             * sqrt(list_inner_product(c.centroid, c.centroid))), 6) DESC,
        |        c.cell) AS rk
        |    FROM e CROSS JOIN cents c
        |  ) WHERE rk = 1
        |), qsel AS (
        |  SELECT vec_id FROM e WHERE vec_id % 25 = 0
        |  ORDER BY (vec_id * 1000003) % 999983, vec_id LIMIT 1024
        |), q AS (
        |  SELECT vec_id AS q_id, v AS q_vec FROM e JOIN qsel USING (vec_id)
        |), probed AS (
        |  SELECT q_id, q_vec, cell FROM (
        |    SELECT q.q_id, q.q_vec, c.cell,
        |      row_number() OVER (PARTITION BY q.q_id ORDER BY
        |        round(list_inner_product(q.q_vec, c.centroid)
        |          / (sqrt(list_inner_product(q.q_vec, q.q_vec))
        |             * sqrt(list_inner_product(c.centroid, c.centroid))), 6) DESC,
        |        c.cell) AS crk
        |    FROM q CROSS JOIN cents c
        |  ) WHERE crk <= 2
        |), ap AS (
        |  SELECT q_id, cand_id FROM (
        |    SELECT s.*, row_number() OVER (
        |      PARTITION BY q_id ORDER BY sim DESC, cand_id) AS rank
        |    FROM (
        |      SELECT p.q_id, a.vec_id AS cand_id,
        |        round(list_inner_product(p.q_vec, a.v)
        |          / (sqrt(list_inner_product(p.q_vec, p.q_vec))
        |             * sqrt(list_inner_product(a.v, a.v))), 6) AS sim
        |      FROM probed p JOIN assign a USING (cell)
        |      WHERE p.q_id <> a.vec_id
        |    ) s
        |  ) WHERE rank <= 5
        |), ex AS (
        |  SELECT q_id, cand_id FROM (
        |    SELECT s.*, row_number() OVER (
        |      PARTITION BY q_id ORDER BY sim DESC, cand_id) AS rank
        |    FROM (
        |      SELECT q.q_id, e.vec_id AS cand_id,
        |        round(list_inner_product(q.q_vec, e.v)
        |          / (sqrt(list_inner_product(q.q_vec, q.q_vec))
        |             * sqrt(list_inner_product(e.v, e.v))), 6) AS sim
        |      FROM q CROSS JOIN e
        |      WHERE q.q_id <> e.vec_id
        |    ) s
        |  ) WHERE rank <= 5
        |), hits AS (
        |  SELECT ex.q_id, count(*) AS n
        |  FROM ex JOIN ap ON ex.q_id = ap.q_id AND ex.cand_id = ap.cand_id
        |  GROUP BY ex.q_id
        |)
        |SELECT q.q_id, coalesce(h.n, 0) AS n_hits,
        |  round(coalesce(h.n, 0) / 5.0, 6) AS recall_at_k
        |FROM q LEFT JOIN hits h USING (q_id)
        |ORDER BY q.q_id""".stripMargin,


    // qs14: the materialized cell-partitioned index probed with
    // dynamic partition pruning — row-identical to qs12 by construction
    // (same centroids, assignment, and probe pipeline), so it shares
    // the same full SQL recompute.
    "qs14_ann_indexed" -> annLowProbeOracle,

    // qe6: per-cell occupancy + cohesion under the same deterministic
    // quantizer as qs12/qe4 (full-corpus label-mean centroids,
    // 6dp-rounded argmax over finite-norm vectors); per-row cosines
    // round to 6dp before the aggregates, the mean once more.
    // Cluster-balanced diversity sampling: the qe6 assignment CTEs, a
    // prototypical-first rank window per cell, and an integer ceil-20%
    // quota — every live vector reported with its keep decision.
    // Index advisor: every compression method's full mirror re-run
    // verbatim, integer hit counts vs the exact capped ground truth.
    "qe14_index_advisor" -> advisorSql,
    // nDCG@k + MRR of the SQ8 ranking, label-graded, integer-micro
    "qe19_ndcg_eval" -> ndcgSql,
    // IVF-SQ8: qe11's encode + qe9's probe, composed
    "qe20_ivfsq_topk" -> ivfSqSql,

    "qe13_cluster_sample" ->
      """WITH e AS (
        |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
        |), comp AS (
        |  SELECT label AS cell, i AS dim, avg(v[i::INT]) AS m
        |  FROM e CROSS JOIN unnest(range(1, len(v) + 1)) r(i)
        |  GROUP BY label, i
        |), cents AS (
        |  SELECT cell, list(m ORDER BY dim) AS centroid FROM comp GROUP BY cell
        |), live AS (
        |  SELECT * FROM e
        |  WHERE isfinite(list_inner_product(v, v)) AND list_inner_product(v, v) <> 0
        |), assign AS (
        |  SELECT vec_id, cell, v FROM (
        |    SELECT l.vec_id, c.cell, l.v,
        |      row_number() OVER (PARTITION BY l.vec_id ORDER BY
        |        round(list_inner_product(l.v, c.centroid)
        |          / (sqrt(list_inner_product(l.v, l.v))
        |             * sqrt(list_inner_product(c.centroid, c.centroid))), 6) DESC,
        |        c.cell) AS rk
        |    FROM live l CROSS JOIN cents c
        |  ) WHERE rk = 1
        |), cs AS (
        |  SELECT a.vec_id, a.cell,
        |    round(list_inner_product(a.v, c.centroid)
        |      / (sqrt(list_inner_product(a.v, a.v))
        |         * sqrt(list_inner_product(c.centroid, c.centroid))), 6) AS csim
        |  FROM assign a JOIN cents c USING (cell)
        |), rk AS (
        |  SELECT vec_id, cell, csim,
        |    row_number() OVER (PARTITION BY cell
        |      ORDER BY csim DESC, vec_id) AS cell_rank,
        |    count(*) OVER (PARTITION BY cell) AS n_cell
        |  FROM cs
        |)
        |SELECT vec_id, cell::INT AS cell, csim,
        |  cell_rank::BIGINT AS cell_rank,
        |  ((n_cell + 4) // 5)::BIGINT AS quota,
        |  cell_rank <= (n_cell + 4) // 5 AS keep
        |FROM rk ORDER BY vec_id""".stripMargin,

    // Temperature mixture: alpha = 0.5 over lang strata — integer
    // micro-weights round(sqrt(n)*1e6) (sqrt is correctly rounded in
    // IEEE, so both engines agree bit-for-bit), integer quota floor,
    // deterministic (md5(text), doc_id) fill like qd15/qd16.
    "qd34_temperature_mixture" ->
      s"""WITH n AS (
        |  SELECT lang, count(*)::BIGINT AS n FROM documents GROUP BY 1
        |), w AS (
        |  SELECT lang, CAST(round(sqrt(n::DOUBLE) * 1e6) AS BIGINT) AS w
        |  FROM n
        |), tw AS (
        |  SELECT sum(w)::BIGINT AS tw FROM w
        |), q AS (
        |  SELECT lang, (${TextOps.DefaultMixtureBudget} * w.w) // t.tw AS quota
        |  FROM w CROSS JOIN tw t
        |), r AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(text), doc_id) AS rn
        |  FROM documents
        |)
        |SELECT r.doc_id, r.lang, r.rn::BIGINT AS mix_rank, q.quota
        |FROM r JOIN q USING (lang) WHERE r.rn <= q.quota
        |ORDER BY doc_id""".stripMargin,

    "qe6_cluster_stats" ->
      """WITH e AS (
        |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
        |), comp AS (
        |  SELECT label AS cell, i AS dim, avg(v[i::INT]) AS m
        |  FROM e CROSS JOIN unnest(range(1, len(v) + 1)) r(i)
        |  GROUP BY label, i
        |), cents AS (
        |  SELECT cell, list(m ORDER BY dim) AS centroid FROM comp GROUP BY cell
        |), live AS (
        |  SELECT * FROM e
        |  WHERE isfinite(list_inner_product(v, v)) AND list_inner_product(v, v) <> 0
        |), assign AS (
        |  SELECT vec_id, cell, v FROM (
        |    SELECT l.vec_id, c.cell, l.v,
        |      row_number() OVER (PARTITION BY l.vec_id ORDER BY
        |        round(list_inner_product(l.v, c.centroid)
        |          / (sqrt(list_inner_product(l.v, l.v))
        |             * sqrt(list_inner_product(c.centroid, c.centroid))), 6) DESC,
        |        c.cell) AS rk
        |    FROM live l CROSS JOIN cents c
        |  ) WHERE rk = 1
        |), cos AS (
        |  SELECT a.cell,
        |    round(list_inner_product(a.v, c.centroid)
        |      / (sqrt(list_inner_product(a.v, a.v))
        |         * sqrt(list_inner_product(c.centroid, c.centroid))), 6) AS cos
        |  FROM assign a JOIN cents c USING (cell)
        |)
        |SELECT cell, count(*)::BIGINT AS n_vectors,
        |  round(avg(cos), 6) AS avg_cos, min(cos) AS min_cos
        |FROM cos GROUP BY cell
        |ORDER BY cell""".stripMargin,

    // Every `queries` entry has an oracle: the one query with no
    // SQL-expressible oracle (qs3, non-separable KMeans) is bench-only —
    // see `benchOnlyQueries`.
  )
}
