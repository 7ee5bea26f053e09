from .store import ProfileStore
from .tables import load_table
from .why1 import read_why1, write_why1

__all__ = ["ProfileStore", "load_table", "read_why1", "write_why1"]
