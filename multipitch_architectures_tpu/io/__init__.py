"""Host IO: native (C++) mmap npy loader with prefetch."""

from .audio import (NOTE_EVENT_SCHEMAS, NoteEventSchema, load_audio,
                    load_note_events, note_name_to_midi)
from .native_loader import (NativeWindowLoader, build_native_library,
                            trainer_batches)

__all__ = ["NativeWindowLoader", "build_native_library", "trainer_batches",
           "load_audio", "load_note_events", "NoteEventSchema",
           "NOTE_EVENT_SCHEMAS", "note_name_to_midi"]
