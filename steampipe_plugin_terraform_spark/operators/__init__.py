from . import dedup, multimodal, similarity, storage, text

__all__ = ["dedup", "similarity", "storage", "text", "multimodal"]
