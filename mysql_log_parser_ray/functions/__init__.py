"""Pure per-record functions: slow-log parsing, fingerprinting, checksums.

No Ray dependency here; stages/ wraps these into vectorized batch transforms.
"""

from .fingerprint import Checksum, Fingerprint, StripComments  # noqa: F401
from .slowlog import parse_slow_log_text  # noqa: F401
from .ts import convert_slow_log_ts, format_example_ts  # noqa: F401
