"""Offline tooling: track/costmap generation, converters, evaluators."""
