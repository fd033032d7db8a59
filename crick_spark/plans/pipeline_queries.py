"""LLM-data-pipeline queries (dedup / similarity / text analysis / multimodal).

Populated as the pipeline operators land (SURVEY §7.4).
"""
