from .sdflib_binary import load_sdflib_bin, save_sdflib_bin  # noqa: F401
