"""Plans — the declarative instance layer (ref: minerva/instance/* [U]):
dataclass specs for trend stores / aggregations / triggers, compiled to
DataFrame pipelines (the Spark analog of Minerva's YAML→SQL codegen)."""
