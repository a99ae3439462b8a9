from . import codec, datagen  # noqa: F401
