"""Streaming language identification — the q157 batch classifier as a
foreachBatch stage (r9 verdict item 5).

The pipeline story runs ingest -> dedup -> langid -> quality-filter; the
other stages already have streaming twins (streaming/dedup.py,
streaming/neardedup.py), and this closes the gap: a classifier trained
ONCE on a labeled corpus (operators/langid.py — the same train half
q157 uses), whose per-language profile table is broadcast into every
micro-batch's rank-distance join. Classification is a pure function of
(doc text, profiles), so batch and stream predictions are identical by
construction — pinned by tests/test_streaming_langid.py.

No Python stages: the per-batch work is the q157 classification plan
(trigram explode -> per-doc top-K ranks -> broadcast profile join ->
min-distance window), all JVM-side.

Scale: profiles are |langs| x K rows — broadcast state, no state store
needed; each micro-batch's cost is bounded by its own trigram count.
The reference's streaming surface is the per-event inference loop
(/root/reference/core/inference.py:227-281); this follows the same
foreachBatch contract as streaming/inference.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from feature_store_test_spark.operators.langid import (
    LANGID_K,
    classify_trigrams,
    train_trigram_profiles,
)


class StreamingLangId:
    """Trained trigram classifier applied per micro-batch.

    ``train`` on a labeled corpus once; ``process_batch`` is the
    foreachBatch body (or call directly for backfills). The profile
    and candidate tables are persisted — they are a few hundred rows
    and every batch joins them — and released by ``close()``.
    """

    def __init__(
        self,
        profiles: DataFrame,
        langs: DataFrame,
        id_col: str = "doc_id",
        k: int = LANGID_K,
    ) -> None:
        self.id_col = id_col
        self.k = k
        self._profiles = profiles.persist()
        self._langs = langs.persist()

    @classmethod
    def train(
        cls,
        corpus: DataFrame,
        lang_col: str = "lang",
        id_col: str = "doc_id",
        k: int = LANGID_K,
    ) -> "StreamingLangId":
        profiles, langs = train_trigram_profiles(corpus, lang_col=lang_col, k=k)
        return cls(profiles, langs, id_col=id_col, k=k)

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> DataFrame:
        """(id_col, predicted_lang) for one micro-batch. Docs shorter
        than one trigram are absent — the q157 contract."""
        return classify_trigrams(
            batch, self._profiles, self._langs, id_col=self.id_col, k=self.k
        )

    def close(self) -> None:
        for df in (self._profiles, self._langs):
            try:
                df.unpersist()
            except Exception:  # noqa: BLE001 — dead session must not mask cleanup
                pass
