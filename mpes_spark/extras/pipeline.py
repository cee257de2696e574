"""CorpusPipeline — fluent curation chain for the training-data
pillar, the documents-side sibling of
:class:`mpes_spark.pipeline.EventPipeline`.

A typical pretraining recipe reads top to bottom::

    clean = (
        CorpusPipeline(docs)
        .with_stats()                      # tokens / quality / lang / fingerprint
        .quality_filter()                  # Gopher-style rules
        .redact_pii()
        .dedup_exact()                     # corpus-wide keep-first
        .dedup_chunks(chunk_tokens=64)     # CC-Net paragraph-level
        .decontaminate(benchmark_docs)     # 8-gram collision scrub
        .sample_budget(1_000_000)          # per-source mixture budget
        .df
    )
    shards = CorpusPipeline(clean).chunk(chunk_tokens=512)

Every step is a new immutable pipeline over a lazily planned
DataFrame; projection-only steps (stats, PII, quality flags) fuse into
a single scan, and the shuffling steps keep the plan shapes documented
in SCALING.md §4 (hash-keyed dedup joins, per-source windows, AQE-
decided join strategies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mpes_spark.extras import curation as CU
from mpes_spark.extras import dedup as DD
from mpes_spark.extras import text as TX


class CorpusPipeline:
    """Fluent, immutable document-corpus curation pipeline."""

    def __init__(self, df: DataFrame, text: str = "text", id_col: str = "doc_id"):
        self.df = df
        self.text = text
        self.id_col = id_col

    def _wrap(self, df: DataFrame) -> "CorpusPipeline":
        return CorpusPipeline(df, self.text, self.id_col)

    # -- per-doc annotation (single fused scan) ---------------------------

    def html_to_text(self) -> "CorpusPipeline":
        """Crawl stage 0 (r9 late): replace the text column with its
        extracted readable text — comments/script/style subtrees
        dropped, block-closers to newlines, tags stripped, one level
        of entity decode, whitespace canonicalized. A stateless
        JVM-side projection (extras/html.py); run it FIRST so every
        downstream stat/filter/dedup stage sees content, not markup."""
        from mpes_spark.extras.html import html_to_text_expr

        return self._wrap(
            self.df.withColumn(self.text, html_to_text_expr(self.text))
        )

    def with_stats(self) -> "CorpusPipeline":
        """Append token/quality/language/fingerprint stat columns."""
        return self._wrap(TX.with_text_stats(self.df, self.text))

    def redact_pii(self) -> "CorpusPipeline":
        """Replace email/phone/SSN spans with ``<CATEGORY>`` tags."""
        return self._wrap(
            self.df.withColumn(self.text, TX.redact_pii_expr(self.text))
        )

    # -- filtering --------------------------------------------------------

    def quality_filter(self) -> "CorpusPipeline":
        """Keep docs passing every Gopher-style rule (GOPHER_RULES)."""
        m = {name: fn(self.text) for name, fn in TX.GOPHER_METRICS_EXPR.items()}
        fl = TX.gopher_flags_expr(
            m["m_ntok"], m["m_mwl"], m["m_stop"], m["m_dup2"]
        )
        keep = None
        for c in fl.values():
            keep = c if keep is None else (keep & c)
        return self._wrap(self.df.filter(keep))

    def quality_quantile(
        self, q: float = 0.25, group: str = "source"
    ) -> "CorpusPipeline":
        """Adaptive per-group quality floor: drop docs below their
        group's ``q`` quality quantile (exact percent_rank — the
        per-domain calibration fixed thresholds can't do)."""
        keep = CU.quality_quantile_filter(
            self.df, q, group, self.text, self.id_col
        ).select(self.id_col)
        return self._wrap(self.df.join(keep, self.id_col, "left_semi"))

    def lang_filter(self, *langs: str) -> "CorpusPipeline":
        """Keep docs whose marker-word language guess is in ``langs``."""
        return self._wrap(
            self.df.filter(TX.lang_id_expr(self.text).isin(*langs))
        )

    # -- deduplication ----------------------------------------------------

    def dedup_exact(self) -> "CorpusPipeline":
        """Corpus-wide keep-first exact dedup on the content
        fingerprint (16-byte-key shuffle)."""
        return self._wrap(DD.exact_dedup(self.df, self.text, self.id_col))

    def dedup_url(self, url: str = "url") -> "CorpusPipeline":
        """URL-level dedup — the crawl-curation FIRST stage (runs
        before any content op because it needs no document bytes):
        canonicalize ``url`` and keep each canonical key's min-id doc.
        No-op for corpora without a ``url`` column."""
        from mpes_spark.extras.curation import url_normalize_expr

        if url not in self.df.columns:
            return self
        canon = self.df.withColumn("__canon", url_normalize_expr(url))
        keep = canon.groupBy("__canon").agg(
            F.min(self.id_col).alias(self.id_col)
        )
        return self._wrap(
            canon.join(keep, [self.id_col, "__canon"], "left_semi").drop(
                "__canon"
            )
        )

    def dedup_near(
        self,
        threshold: float = 0.5,
        n: int = 3,
        k: int = 32,
        bands: int = 8,
    ) -> "CorpusPipeline":
        """MinHash-LSH near-dedup resolved to clusters: candidate
        pairs (banded LSH, exact-Jaccard verified at ``threshold``)
        -> connected components -> keep each cluster's min-id doc.
        Transitive chains (A~B, B~C) collapse to one survivor even
        when A~C never surfaced as a pair."""
        pairs = DD.minhash_neardup_pairs(
            self.df, self.text, self.id_col, n=n, k=k, bands=bands,
            threshold=threshold,
        )
        cc = DD.connected_components(pairs, self.id_col)
        drop = cc.filter(F.col(self.id_col) != F.col("cluster_id")).select(
            self.id_col
        )
        return self._wrap(self.df.join(drop, self.id_col, "left_anti"))

    def neardup_report(
        self,
        jaccard_threshold: float = 0.5,
        containment_threshold: float = 0.8,
        n: int = 3,
    ) -> DataFrame:
        """Both near-dup verdicts — symmetric Jaccard and asymmetric
        containment — for every pair passing either threshold, from
        ONE shared candidate relation and ONE intersection aggregate
        (:func:`~mpes_spark.extras.dedup.prefix_dual_pairs`). Use this
        instead of running the Jaccard and containment operators
        back-to-back: the expensive stages (element relation, prefix
        candidates, intersection join) are shared work, paid once."""
        return DD.prefix_dual_pairs(
            self.df, self.text, jaccard_threshold, containment_threshold,
            n, self.id_col,
        )

    def dedup_near_dual(
        self,
        jaccard_threshold: float = 0.5,
        containment_threshold: float = 0.8,
        n: int = 3,
    ) -> "CorpusPipeline":
        """Drop near-duplicates flagged by EITHER measure: dual-verdict
        pairs (shared candidate machinery) -> connected components ->
        keep each cluster's min-id doc. Containment edges fold the
        embedded-doc case (short doc quoted inside a long one) into the
        same transitive clusters Jaccard edges form."""
        pairs = DD.prefix_dual_pairs(
            self.df, self.text, jaccard_threshold, containment_threshold,
            n, self.id_col,
        ).select("id_a", "id_b")
        cc = DD.connected_components(pairs, self.id_col)
        drop = cc.filter(F.col(self.id_col) != F.col("cluster_id")).select(
            self.id_col
        )
        return self._wrap(self.df.join(drop, self.id_col, "left_anti"))

    def dedup_against(
        self,
        corpus: DataFrame,
        threshold: float = 0.7,
        n: int = 3,
    ) -> "CorpusPipeline":
        """Incremental ingest dedup with ZERO recall loss: drop docs
        of THIS pipeline (the incoming batch) whose n-gram Jaccard
        against any doc of the standing ``corpus`` reaches
        ``threshold`` — the cross-relation prefix join
        (:func:`~mpes_spark.extras.dedup.prefix_filtered_join`), the
        complete alternative to the streaming LSH ingest path. The
        batch side is the natural broadcast; corpus docs are never
        modified."""
        hit = DD.prefix_filtered_join(
            self.df, corpus, self.text, threshold, n, self.id_col
        ).select(F.col("id_a").alias(self.id_col)).distinct()
        return self._wrap(self.df.join(hit, self.id_col, "left_anti"))

    def dedup_chunks(
        self, chunk_tokens: int = 64, min_tokens: int = 1
    ) -> "CorpusPipeline":
        """Drop docs that lose ANY chunk to cross-doc duplication
        (strict CC-Net-style variant; use
        :func:`~mpes_spark.extras.curation.chunk_dedup_stats` directly
        for partial-content salvage)."""
        hit = CU.chunk_dedup_stats(
            self.df, chunk_tokens, self.text, self.id_col, min_tokens
        ).select(self.id_col)
        return self._wrap(self.df.join(hit, self.id_col, "left_anti"))

    def decontaminate(self, benchmark: DataFrame, n: int = 8) -> "CorpusPipeline":
        """Remove docs sharing >= 1 word n-gram with the benchmark
        set (GPT-3 appendix C shape; benchmark side broadcasts)."""
        bad = CU.contaminated_docs(
            self.df, benchmark, n, self.text, self.id_col
        )
        return self._wrap(self.df.join(bad, self.id_col, "left_anti"))

    # -- stage-boundary materialization -----------------------------------

    def pin(self) -> "CorpusPipeline":
        """Materialization point (r11, guide §2/§5): persist the
        current stage's output before a stage that consumes it MORE
        THAN ONCE. Every dedup/sample stage built on the
        ids-then-semi-join idiom (the shape that keeps full-width rows
        out of group-keyed exchanges at 100 TB) references ``self.df``
        on BOTH sides of its join, so an unpinned k-stage chain
        re-executes its upstream per join side (measured: the 3-stage
        corpus_recipe_e2e plan scanned the corpus 8x; with two pins
        2.29 s -> 1.51 s median, 2.17 -> 1.38 s min, 3 cold sf0.1
        reps). At 100 TB this is exactly where a recipe would write a
        stage boundary to storage; in-session, MEMORY_AND_DISK
        persistence is the same decision. NOT automatic: pinning a
        stage consumed once (or one whose recompute is a stateless
        scan) measured SLOWER than recompute elsewhere in this round
        (perplexity_bucket_assignments, cluster_safe_splits —
        OPTIMIZATION_r11.md), so the caller chooses. The caller also
        owns the unpersist (or session teardown)."""
        return self._wrap(self.df.persist())

    # -- sampling / sharding ----------------------------------------------

    def sample_quota(self, quota: int, group: str = "source") -> "CorpusPipeline":
        """Keep at most ``quota`` docs per group (hash-ranked)."""
        ids = CU.stratified_sample(
            self.df, quota, group, self.text, self.id_col
        ).select(self.id_col)
        return self._wrap(self.df.join(ids, self.id_col, "left_semi"))

    def sample_weighted(
        self, k: int, group: str = "source", weight: str = "n_chars"
    ) -> "CorpusPipeline":
        """Keep ``k`` docs per group, inclusion probability
        proportional to ``weight`` (Efraimidis–Spirakis A-ES without
        replacement) — weight by a quality score and the sample tilts
        toward it without a resampling pass."""
        ids = CU.weighted_sample(self.df, k, group, weight, self.id_col).select(
            self.id_col
        )
        return self._wrap(self.df.join(ids, self.id_col, "left_semi"))

    def sample_budget(
        self, budget_tokens: int, group: str = "source"
    ) -> "CorpusPipeline":
        """Keep docs within each group's token budget (mixture
        weights as budgets, hash order)."""
        ids = CU.token_budget_sample(
            self.df, budget_tokens, group, self.text, self.id_col
        ).select(self.id_col)
        return self._wrap(self.df.join(ids, self.id_col, "left_semi"))

    def perplexity_filter(
        self,
        keep_buckets: int = 2,
        nbuckets: int = 3,
        by: str = "lang",
        alpha: float = 0.5,
    ) -> "CorpusPipeline":
        """CC-Net bucket filter (Wenzek et al. 2020): keep docs in the
        ``keep_buckets`` most-fluent of ``nbuckets`` per-``by``
        perplexity buckets (head+middle by default, dropping the
        tail)."""
        from mpes_spark.extras import search as SR
        from pyspark.sql import Window

        per = SR.lm_perplexity_per_doc(
            self.df, alpha, self.text, self.id_col, keep=(by,)
        )
        w = Window.partitionBy(by).orderBy(
            F.round(F.col("ppl"), 6), F.col(self.id_col)
        )
        ids = (
            per.withColumn("bucket", F.ntile(nbuckets).over(w))
            .filter(F.col("bucket") <= keep_buckets)
            .select(self.id_col)
        )
        return self._wrap(self.df.join(ids, self.id_col, "left_semi"))

    def sample_by_temperature(
        self,
        token_budget: int,
        alpha: float = 0.3,
        group: str = "source",
    ) -> "CorpusPipeline":
        """Temperature-scaled mixing (q ∝ p^alpha): compute each
        group's slice of ``token_budget`` from
        :func:`curation.temperature_mix_weights`, then keep docs
        within that per-group budget (hash order, like
        :meth:`sample_budget`)."""
        budgets = CU.temperature_mix_weights(
            self.df, alpha, token_budget, group, self.text
        ).select(group, "budget_tokens")
        ids = CU.token_budget_sample_grouped(
            self.df, budgets, group, self.text, self.id_col
        ).select(self.id_col)
        return self._wrap(self.df.join(ids, self.id_col, "left_semi"))

    def select_by_importance(
        self,
        target_pred: str = "lang = 'en'",
        min_weight: float = 0.0,
    ) -> "CorpusPipeline":
        """Keep docs whose DSIR importance weight (target-vs-source
        hashed-token log-likelihood ratio, ``curation.dsir_weights``)
        is >= ``min_weight`` — selection toward a target domain by
        content, not metadata."""
        ids = (
            CU.dsir_weights(
                self.df, target_pred, text=self.text, id_col=self.id_col
            )
            .filter(F.col("weight") >= min_weight)
            .select(self.id_col)
        )
        return self._wrap(self.df.join(ids, self.id_col, "left_semi"))

    # -- terminal shapes ---------------------------------------------------

    def chunk(self, chunk_tokens: int = 512) -> DataFrame:
        """Pretokenization shard map (id, chunk_idx, n_tokens, hash)."""
        return CU.chunk_documents(self.df, chunk_tokens, self.text, self.id_col)

    def pack(self, seq_tokens: int = 512, buckets: int = 32) -> DataFrame:
        """Concat-then-chunk packing layout (two-phase global cumsum)."""
        return CU.pack_sequences(
            self.df, seq_tokens, self.text, self.id_col, buckets
        )

    def check(self, checks, fail_fast: bool = False) -> DataFrame:
        """Data-quality gate (:mod:`mpes_spark.dq`): evaluate the
        constraint list in one aggregation pass over the CURRENT
        corpus state — drop this between stages to audit what a
        dedup/filter step did to the data. ``fail_fast=True`` raises
        if any constraint fails (the CI-pipeline mode); otherwise
        returns the (check_name, metric, passed) report."""
        from mpes_spark.dq import check_constraints

        rep = check_constraints(self.df, checks)
        if fail_fast:
            bad = [r["check_name"] for r in rep.collect() if r["passed"] == 0]
            if bad:
                raise ValueError(f"data-quality constraints failed: {bad}")
        return rep

    def count_tokens(self) -> int:
        """Total whitespace tokens in the current corpus."""
        return int(
            self.df.agg(
                F.sum(F.size(F.split(F.col(self.text), " "))).alias("n")
            ).collect()[0]["n"]
            or 0
        )
