"""Query operators: profiling aggregates (SURVEY.md §2.4/§2.5),
training-data dedup/similarity/text-analysis, multimodal plumbing."""
