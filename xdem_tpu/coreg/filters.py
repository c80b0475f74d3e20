"""Coregistration filters (placeholder, as in the reference).

The reference ships this module as a "coming soon" placeholder (reference
/root/reference/xdem/coreg/filters.py:1-19). Kept for API parity; outlier filtering is
currently handled by inlier masks and the robust estimators inside each method.
"""
