"""Post-aggregation analysis operators (SURVEY §2.6).

Driver-side numpy implementations operating on densified histograms
(the ≤ tens-of-MB binned arrays), plus ``applyInPandas`` adapters
where the operation batches over many groups/slices.
"""
