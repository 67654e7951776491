from .documents import read_documents, read_media  # noqa: F401
