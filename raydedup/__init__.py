"""raydedup — a Ray-Data-native near-duplicate detection + clustering engine.

Built from scratch over ``ray.data.Dataset`` pipelines for Parquet tables of
multi-turn conversation / agent transcripts (schema per ``raydedup.schema``).
Capabilities derive from the behavior of the reference repo
``yashpotdar-py/face-duplicate-detection`` (see SURVEY.md): greedy
similarity-threshold dedup + star clustering (``duplicate_face.py:57-82``,
``face_recognition_custom.py:102-117``) re-expressed order-free and
distributed as shingling → MinHash/SimHash signatures → LSH banding →
candidate-pair verification → connected components.

No code is copied from the reference; citations in docstrings are
behavioral parity pointers only.
"""

from raydedup.config import DedupConfig

__all__ = ["DedupConfig"]
__version__ = "0.1.0"
