from .glyph_model import GlyphModel  # noqa: F401
