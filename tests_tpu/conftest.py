"""TPU-suite conftest: persistent compilation cache.

Tunnel-up windows are scarce (outages of hours observed); the persistent
cache makes every suite run after the first nearly compile-free.
"""

from autorally_tpu.io.compile_cache import enable_persistent_cache

enable_persistent_cache()
