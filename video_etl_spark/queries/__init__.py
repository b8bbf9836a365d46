"""Named, oracle-verified queries — one per operator family in SURVEY.md §2."""
