from .extract import ExtractConfig, ocr_media, run_extract, validate_against_golden  # noqa: F401
