from .validate import ValidationOptions, ValidationResult, validate_images  # noqa: F401
