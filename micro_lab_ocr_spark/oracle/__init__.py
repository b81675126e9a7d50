"""Pure-Python oracle: a straight-line restatement of the reference's
extraction math (SURVEY.md §5.2). Used only by pytest as the executable spec;
the engine itself never calls this at scale."""
