"""Analysis / evaluation operators (SURVEY.md §2.2)."""

from .displacement import displacement, summarize_displacement  # noqa: F401
from .aggregates import central_drift, summarize_column, k_satisfaction, summarize_k  # noqa: F401
from .k_anonymity import calculate_k, estimate_k, k_anonymity  # noqa: F401
from .nnd import nnd, nnd_delta  # noqa: F401
