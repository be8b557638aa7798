"""maskmypy_ray — a from-scratch Ray-Data-native geomasking + spatial
analysis engine with the semantics of TheTinHat/MaskMyPy, applied to
lat/lon points geoparsed from Common-Crawl-style web-page tables.

Reference: /root/reference (read-only). Architecture: SURVEY.md.
"""

__version__ = "0.1.0"
