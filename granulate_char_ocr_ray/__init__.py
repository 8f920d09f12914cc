"""granulate_char_ocr_ray — a Ray-Data-native extraction engine.

A from-scratch reimplementation of the data-processing capabilities of
the reference ``engkimo/granulate-char-OCR`` (glyph OCR over images:
binarize -> segment -> classify -> ordered reassembly), grafted onto the
interleaved-document extraction shape mandated by BASELINE.json:

  input:  table of (doc_id:string, spans:list<struct<kind,text,media_ref,offset>>)
  output: flat span rows (doc_id, order, kind, text, media_ref) where
          text-like spans go through stateless extractors (HTML
          boilerplate strip, PDF layout reconstruction, whitespace
          normalize) and media spans go through the glyph pipeline
          (decode -> binarize -> projection segmentation -> hash/Hamming
          nearest-prototype classification), reassembled in original
          span-offset order per document.

Everything executes as ``ray.data.Dataset`` pipelines: ``map_batches``
over zero-copy Arrow batches for stateless stages, actor pools for the
stateful classifier, one ``groupby(doc_id)`` shuffle for reassembly.
Pure-NumPy ops live in ``functions/`` and are shared verbatim by the
single-process oracle (``oracle.py``) so engine-vs-oracle equality is
bit-exact.

No code is copied from the reference; reference file:line citations in
docstrings identify the behavior being re-expressed.
"""

__version__ = "0.1.0"
