from .explode import explode_spans, only_kind  # noqa: F401
from .strip import strip_text_spans  # noqa: F401
from .ocr_actor import OcrActor  # noqa: F401
from .reassemble import add_bucket_column, reassemble, stitch_bucket  # noqa: F401
