from .text import TextStats, LangIdHeuristic, QualityScore
from .dedup import ExactDedupKey, MinHasher, SimHasher, WinnowFingerprint
from .media import MediaFeatureStub

__all__ = [
    "TextStats",
    "LangIdHeuristic",
    "QualityScore",
    "ExactDedupKey",
    "MinHasher",
    "SimHasher",
    "WinnowFingerprint",
    "MediaFeatureStub",
]
