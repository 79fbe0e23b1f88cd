/*
 * This file re-declares part of the public Apache Kafka Connect API.
 *
 * Derived from Apache Kafka (https://kafka.apache.org), licensed under the
 * Apache License, Version 2.0 (the "License"); you may not use this file
 * except in compliance with the License. You may obtain a copy of the
 * License at
 *
 *     http://www.apache.org/licenses/LICENSE-2.0
 *
 * Unless required by applicable law or agreed to in writing, software
 * distributed under the License is distributed on an "AS IS" BASIS, WITHOUT
 * WARRANTIES OR CONDITIONS OF ANY KIND, either express or implied. See the
 * License for the specific language governing permissions and limitations
 * under the License.
 *
 * Minimal binary-compatible Kafka Connect API declaration — see ConnectorContext.java.
 */
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
