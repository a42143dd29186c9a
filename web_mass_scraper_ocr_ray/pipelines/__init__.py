"""Pipeline builders — composed Dataset stages (SURVEY.md §3.4)."""
