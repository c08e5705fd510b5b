"""Training-data-pipeline operators over Ray Data: dedup, similarity search,
text analysis, relational pipelines. These are the scale-path operations a
100 TB corpus needs beyond the reference's own surface (driver mandate)."""
