"""Operator library beyond the flagship extraction pipeline.

- ``relational``  — groupby/sort/join/window operators (SURVEY SS2.6-2.7
  analogs: bench stage totals A1, top-10 O3, usage counters A2,
  distinct A7, registry lookup J2 as a broadcast join, and a tumbling
  windowed aggregate for the streaming analog SS2.10)
- ``dedup``       — exact, MinHash+LSH, SimHash near-dup (training-data ops)
- ``similarity``  — brute-force cosine top-k + IVF-bucketed ANN
- ``textstats``   — quality scoring, token counts, language-ID heuristic,
  normalization + fingerprinting over the documents table
- ``multimodal``  — binary-payload decode plumbing (decode itself stubbed)
"""
