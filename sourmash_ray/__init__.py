"""sourmash_ray — Ray-Data-native near-duplicate engine with the query and
data-processing capabilities of sourmash-bio/sourmash, re-targeted at
conversation-transcript dedup plus the wider training-data toolkit.

See README.md for the architecture, COVERAGE.md for the operator map, and
BASELINE.md for measured performance.
"""

__version__ = "0.1.0"
