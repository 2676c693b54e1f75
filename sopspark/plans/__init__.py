from sopspark.plans.graph import connected_components

__all__ = ["connected_components"]
