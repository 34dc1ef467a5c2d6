from ..params import CacheParams as CacheConfig  # noqa: F401
from .sketch_cache import OPEN_END, Bucket, SketchCache  # noqa: F401
