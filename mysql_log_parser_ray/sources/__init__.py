"""Sequence-table sources: tokenizer, readers, deterministic generators."""

from .sequences import (  # noqa: F401
    SEQUENCE_SCHEMA,
    build_sequences_table,
    detokenize_column,
    read_sequences,
    tokenize,
)
from .synth import (  # noqa: F401
    dim_for_sources,
    generate_corpus,
    reference_fixture_table,
    sequences_from_documents,
)
