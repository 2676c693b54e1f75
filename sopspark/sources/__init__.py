from sopspark.sources.ntriples import parse_ntriples, parse_lines_df
from sopspark.sources.turtle import parse_turtle

__all__ = ["parse_ntriples", "parse_lines_df", "parse_turtle"]
