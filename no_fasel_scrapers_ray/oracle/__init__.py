from .reference_oracle import Oracle, split_into_ranges

__all__ = ["Oracle", "split_into_ranges"]
