"""Ray Data stages: batch transforms over Arrow blocks.

Each stage is either a plain function (stateless tasks) or a callable
class (actor pool) for ``Dataset.map_batches``; see SURVEY.md §7.2 for
the task-vs-actor decision table.
"""
