"""Pure ``DataFrame -> DataFrame`` operators (no I/O).

Layering rule (SURVEY.md §7): everything here is unit-testable without
any storage layer; ``pipeline``/``sources`` own reads, writes and the
versioned-table merge.
"""
