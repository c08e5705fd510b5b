"""raycrawl — a Ray-Data-native crawl/extract engine.

Brand-new implementation (not a port) of the data-processing capabilities of
vishwajeetdabholkar/eGet-Crawler-for-ai on Ray Data: Dataset pipelines of
``map_batches`` over Arrow batches, actor pools for stateful stages, sharded
frontier actors for the crawl loop. See SURVEY.md for the capability map.
"""

__version__ = "0.1.0"
