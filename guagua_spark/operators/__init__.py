"""Query operators: the declared relational queries certifying guagua
operator semantics (SURVEY.md §2.10), plus the beyond-reference
training-data-pipeline operators (dedup, similarity, text, multimodal).
"""
