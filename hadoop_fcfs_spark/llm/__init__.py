"""LLM-training-data pipeline operators (extension surface).

The reference (Hadoop MapReduce) has none of these; they are the
net-new capability a 100 TB training-data pipeline needs (SURVEY.md
§7.2 step 6): deduplication (exact / MinHash-LSH / SimHash / n-gram
Jaccard), similarity search (brute-force cosine + LSH-bucketed ANN),
text analysis (language-ID, quality scoring, token counting,
fingerprinting) and multimodal binary-column plumbing.

Everything is DataFrame-native: deterministic xxhash64-based hashing
(no RNG at runtime → reproducible across runs/partitions), shuffles
only on bounded keys (shingles, bands, buckets), no driver-side loops.
"""
