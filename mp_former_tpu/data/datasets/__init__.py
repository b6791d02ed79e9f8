"""Dataset registration modules (reference data/datasets/__init__.py:2-10)."""
