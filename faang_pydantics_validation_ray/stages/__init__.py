from .decode import DecodeChecker  # noqa: F401
from .validate_batch import EVENT_SCHEMA, ValidateImagesBatch  # noqa: F401
