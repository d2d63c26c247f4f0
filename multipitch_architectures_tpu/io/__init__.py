"""Host IO: native (C++) mmap npy loader with prefetch."""

from .audio import load_audio, load_note_events
from .native_loader import (NativeWindowLoader, build_native_library,
                            trainer_batches)

__all__ = ["NativeWindowLoader", "build_native_library", "trainer_batches",
           "load_audio", "load_note_events"]
