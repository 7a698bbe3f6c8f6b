"""Scale-path operators: LSH similarity search, near-duplicate
detection, document fingerprinting.

These are the 100-TB escape hatches for the quadratic exact operators
in ``functions.similarity`` and ``plans.llm``:

- :mod:`.knn` — random-hyperplane (sign) LSH for cosine top-k over
  embedding columns (SURVEY L3 scale path);
- :mod:`.ivf` — IVF-Flat ANN (hash-seeded coarse quantizer + Lloyd
  step + n_probe search), the cluster-exploiting L3 scale path;
- :mod:`.dedup` — MinHash banding (Jaccard), SimHash (Hamming), and
  exact inverted-index n-gram Jaccard near-duplicate detection
  (SURVEY L2).
"""
