"""Scale-path operators: LSH similarity search, near-duplicate
detection, document fingerprinting.

These are the 100-TB escape hatches for the quadratic exact operators
in ``functions.similarity`` and ``plans.llm``:

- :mod:`.knn` — random-hyperplane (sign) LSH for cosine top-k over
  embedding columns (SURVEY L3 scale path);
- :mod:`.ivf` — IVF-Flat ANN (hash-seeded coarse quantizer + Lloyd
  step + n_probe search), the cluster-exploiting L3 scale path;
- :mod:`.dedup` — MinHash banding (Jaccard), SimHash (Hamming), exact
  inverted-index n-gram Jaccard near-duplicate detection (SURVEY L2),
  and train/eval n-gram decontamination;
- :mod:`.quant` — per-vector absmax int8 quantization + integer-dot
  cosine top-k (the memory/IO-bound L3 scale path);
- :mod:`.asof` — as-of join (union + last-value window);
- :mod:`.multimodal` — binary-column decode/feature plumbing
  (mapInPandas; codecs stubbed in this environment).
"""
