"""Shared utilities."""

from partseg_tpu.utils.cache import enable_compilation_cache

__all__ = ["enable_compilation_cache"]
