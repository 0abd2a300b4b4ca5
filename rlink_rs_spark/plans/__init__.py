"""Pipeline plans: the thin fluent layer mapping the reference's DataStream
builder API onto DataFrame transformations. Everything below this layer
(DAG compile, exchanges, chaining, placement -- SURVEY.md §3.2-3.4) is
Catalyst/DAGScheduler territory and intentionally does not exist here."""
