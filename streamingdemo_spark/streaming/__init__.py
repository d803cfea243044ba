"""Streaming layer (SURVEY.md §2.B/E).

The reference's streaming surface is a schema-tagged micro-batched
stream (``DStreamWithSchema``) fed by Kafka stubs on a 10 s batch
interval (``OpContainer.java:47-49``, ``KafkaInput.java``,
``KafkaOutput.java``). Here that becomes Structured Streaming:
``readStream`` → declarative transforms → ``writeStream``, with
watermarks bounding state and ``availableNow`` replay in tests.
"""
