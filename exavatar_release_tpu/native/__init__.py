"""Native (C++) runtime components: threaded decode/prefetch data loader."""
from .loader import NativeLoader, build_native, decode_png_native, native_available

__all__ = ["NativeLoader", "build_native", "decode_png_native", "native_available"]
