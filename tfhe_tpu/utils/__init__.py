from .serialization import (DeserializationError, load, safe_load, safe_save,
                            save)
from .keycache import KeyCache
from .seeding import secure_seed

__all__ = ["save", "load", "safe_save", "safe_load", "DeserializationError",
           "KeyCache", "secure_seed"]
