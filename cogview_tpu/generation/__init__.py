from .magnify import magnify
from .sampling import SamplingParams, Template, compile_template, filling_sequence
from .scoring import inverse_prompt_score
from .tasks import (
    QUERY_TEMPLATES,
    GenerationOutput,
    generate_once,
    parse_query_line,
    post_selection,
    super_resolution,
)

__all__ = [
    "SamplingParams",
    "Template",
    "compile_template",
    "filling_sequence",
    "inverse_prompt_score",
    "magnify",
    "QUERY_TEMPLATES",
    "GenerationOutput",
    "generate_once",
    "parse_query_line",
    "post_selection",
    "super_resolution",
]
