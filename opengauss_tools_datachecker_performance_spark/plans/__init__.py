"""Plan layer: the validation runner (scan → checks → verdicts),
lineage/checkpointing for resume, and report writing."""
