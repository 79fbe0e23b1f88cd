/* Minimal binary-compatible Kafka Connect API declaration — see ConnectorContext.java. */
package org.apache.kafka.connect.connector;

import java.util.Objects;

import org.apache.kafka.connect.data.Schema;

public abstract class ConnectRecord<R extends ConnectRecord<R>> {
    private final String topic;
    private final Integer kafkaPartition;
    private final Schema keySchema;
    private final Object key;
    private final Schema valueSchema;
    private final Object value;
    private final Long timestamp;

    public ConnectRecord(String topic, Integer kafkaPartition,
                         Schema keySchema, Object key,
                         Schema valueSchema, Object value,
                         Long timestamp) {
        this.topic = topic;
        this.kafkaPartition = kafkaPartition;
        this.keySchema = keySchema;
        this.key = key;
        this.valueSchema = valueSchema;
        this.value = value;
        this.timestamp = timestamp;
    }

    public String topic() {
        return topic;
    }

    public Integer kafkaPartition() {
        return kafkaPartition;
    }

    public Schema keySchema() {
        return keySchema;
    }

    public Object key() {
        return key;
    }

    public Schema valueSchema() {
        return valueSchema;
    }

    public Object value() {
        return value;
    }

    public Long timestamp() {
        return timestamp;
    }

    @Override
    public boolean equals(Object o) {
        if (this == o) return true;
        if (o == null || getClass() != o.getClass()) return false;
        ConnectRecord<?> r = (ConnectRecord<?>) o;
        return Objects.equals(topic, r.topic)
                && Objects.equals(kafkaPartition, r.kafkaPartition)
                && Objects.equals(keySchema, r.keySchema)
                && Objects.equals(key, r.key)
                && Objects.equals(valueSchema, r.valueSchema)
                && Objects.equals(value, r.value)
                && Objects.equals(timestamp, r.timestamp);
    }

    @Override
    public int hashCode() {
        return Objects.hash(topic, kafkaPartition, keySchema, key, valueSchema, value, timestamp);
    }
}
