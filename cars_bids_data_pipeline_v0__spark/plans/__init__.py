"""Pipeline plans: bronze→silver transform, silver→gold star-schema
maintenance, and the analytics query surface."""

from .silver import clean_and_transform, transform_records
from .gold import build_star_schema
from .corpus import preprocess_corpus, quality_gate

__all__ = [
    "clean_and_transform",
    "transform_records",
    "build_star_schema",
    "preprocess_corpus",
    "quality_gate",
]
