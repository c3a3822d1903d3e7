"""Large-scale data-pipeline operators (beyond the reference's surface).

All operators are DataFrame-native compositions of built-in
``pyspark.sql.functions`` wherever the semantics allow (JVM-side,
whole-stage-codegen'd, shuffle-aware); Pandas UDFs appear only where a
per-row bit-manipulation or vector kernel genuinely can't be expressed
(simhash, byte-level feature extraction) — and those are Arrow-batched,
never row-at-a-time.

Modules: :mod:`dedup` (exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine), :mod:`similarity` (brute-force cosine top-k, LSH
ANN), :mod:`clustering` (deterministic k-means, SemDeDup-style
cluster-gated near-dup), :mod:`text` (tokenization, language ID,
quality scoring, token counting, fingerprinting, PII redaction,
repetition signals, chunking), :mod:`multimodal` (binary payload
columns + stubbed decoders over mapInPandas), :mod:`sampling`,
:mod:`packing` (sequence packing, training-shard manifests),
:mod:`joins`.
"""
