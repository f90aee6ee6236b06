from . import dedup, json_ops, relational, similarity, text

__all__ = ["relational", "json_ops", "dedup", "similarity", "text"]
