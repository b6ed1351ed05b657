from graphcast_tpu.native.build import get_library, have_native  # noqa: F401
