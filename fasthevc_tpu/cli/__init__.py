"""CLI entry points (SURVEY.md L6: TAppEncoder/TAppDecoder analogs)."""
