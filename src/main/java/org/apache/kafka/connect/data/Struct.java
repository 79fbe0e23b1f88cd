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
package org.apache.kafka.connect.data;

import java.util.Arrays;
import java.util.Objects;

public class Struct {
    private final Schema schema;
    private final Object[] values;

    public Struct(Schema schema) {
        if (schema.type() != Schema.Type.STRUCT)
            throw new IllegalArgumentException("Not a struct schema: " + schema);
        this.schema = schema;
        this.values = new Object[schema.fields().size()];
    }

    public Schema schema() {
        return schema;
    }

    public Struct put(String fieldName, Object value) {
        Field f = lookup(fieldName);
        values[f.index()] = value;
        return this;
    }

    public Struct put(Field field, Object value) {
        values[field.index()] = value;
        return this;
    }

    public Object get(String fieldName) {
        return values[lookup(fieldName).index()];
    }

    public Object get(Field field) {
        return values[field.index()];
    }

    public Object getWithoutDefault(String fieldName) {
        return values[lookup(fieldName).index()];
    }

    public Byte getInt8(String fieldName) {
        return (Byte) get(fieldName);
    }

    public Short getInt16(String fieldName) {
        return (Short) get(fieldName);
    }

    public Integer getInt32(String fieldName) {
        return (Integer) get(fieldName);
    }

    public Long getInt64(String fieldName) {
        return (Long) get(fieldName);
    }

    public Float getFloat32(String fieldName) {
        return (Float) get(fieldName);
    }

    public Double getFloat64(String fieldName) {
        return (Double) get(fieldName);
    }

    public Boolean getBoolean(String fieldName) {
        return (Boolean) get(fieldName);
    }

    public String getString(String fieldName) {
        return (String) get(fieldName);
    }

    public byte[] getBytes(String fieldName) {
        return (byte[]) get(fieldName);
    }

    public Struct getStruct(String fieldName) {
        return (Struct) get(fieldName);
    }

    private Field lookup(String fieldName) {
        Field f = schema.field(fieldName);
        if (f == null)
            throw new IllegalArgumentException("Unknown field: " + fieldName);
        return f;
    }

    @Override
    public boolean equals(Object o) {
        if (this == o) return true;
        if (!(o instanceof Struct)) return false;
        Struct s = (Struct) o;
        return Objects.equals(schema, s.schema) && Arrays.deepEquals(values, s.values);
    }

    @Override
    public int hashCode() {
        return Objects.hash(schema, Arrays.deepHashCode(values));
    }

    @Override
    public String toString() {
        return "Struct{" + Arrays.toString(values) + "}";
    }
}
