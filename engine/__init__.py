"""Ray-Data-native main-content extraction engine for transcript tables.

A from-scratch reimplementation of the document-to-clean-text surface of
the reference OCR stack (waveman800/Deepseek-OCR-API.rs, surveyed in
SURVEY.md) as deterministic, rule-based extraction operators hosted in
``ray.data.Dataset`` pipelines.

Layout (SURVEY.md SS7.1):

- ``schema``       Arrow schemas for input / output / lineage tables
- ``normalize``    exactness-critical text normalization (SURVEY SS2.9, M5)
- ``sniff``        payload-kind detection + segmentation (M4 analog)
- ``html_extract`` Readability-style DOM scoring (M7 + A5 analog)
- ``pdf_extract``  PDF-lite layout parse -> reading-order blocks (M7/M10)
- ``noise``        rule-based tool-output noise filters (M3/M15)
- ``spans``        literal/extracted interleave + (start, end) emission (M12/M13)
- ``extract``      per-turn extraction entry (pure; shared by pipeline & oracle)
- ``oracle``       single-process row-at-a-time reference extractor
- ``synth``        deterministic synthetic transcript generator (seed=42)
- ``pipeline``     ray.data plan assembly (actor pools, ordering, skew)
- ``checkpoint``   per-partition manifests, fingerprints, atomic rename, resume
- ``ops``          relational / dedup / similarity / text-analysis operators
"""

__version__ = "0.1.0"

from .schema import SCHEMA_VERSION  # single source of truth (schema.py)
