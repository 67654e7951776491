"""tesseract_wasm_ray — a Ray-Data-native document-extraction engine.

A from-scratch reimplementation (NOT a port) of the data-processing
capabilities of robertknight/tesseract-wasm as streaming
``ray.data.Dataset`` pipelines: image binarization (Otsu), page layout
analysis into lines/words, glyph recognition with per-word confidences
and StartOfLine/EndOfLine flags, orientation detection (0/90/180/270),
plain-text + hOCR rendering, and a DOM-heuristic boilerplate stripper,
over tables of interleaved text + media documents
(``doc_id, spans: list<struct<kind, text, media_ref, offset>>``).

Reference semantics: /root/reference/src/ocr-engine.ts,
/root/reference/src/lib.cpp (cited per-function in docstrings).
"""

__version__ = "0.1.0"

MODEL_VERSION = "glyph-5x7-v1"


def __getattr__(name):
    # Lazy façade: keep `import tesseract_wasm_ray` light (no ray import
    # at module load; the driver imports this before ray.init config).
    if name == "OCREngine":
        from .engine import OCREngine

        return OCREngine
    if name == "OCRClient":
        from .client import OCRClient

        return OCRClient
    if name == "ExtractConfig":
        from .pipelines.extract import ExtractConfig

        return ExtractConfig
    if name == "run_extract":
        from .pipelines.extract import run_extract

        return run_extract
    raise AttributeError(name)
