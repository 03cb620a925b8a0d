"""Native (C++) components: the host-side mesh data loader.

Built with `make -C perception_tpu/native`; consumed through ctypes with a
transparent pure-Python fallback (perception_tpu.core.mesh).
"""

from perception_tpu.native.loader import load_mesh_native, native_available  # noqa: F401
