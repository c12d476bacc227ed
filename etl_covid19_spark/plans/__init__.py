"""Pipeline plans: star-schema build, quality gates, the re-hosted
reference pipeline (SURVEY.md §3, §7.2 steps 5-7)."""
