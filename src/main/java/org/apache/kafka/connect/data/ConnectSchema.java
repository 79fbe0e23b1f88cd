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

import java.util.Collections;
import java.util.List;
import java.util.Objects;

public class ConnectSchema implements Schema {
    private final Type type;
    private final boolean optional;
    private final Object defaultValue;
    private final String name;
    private final Integer version;
    private final String doc;
    private final List<Field> fields;
    private final Schema keySchema;
    private final Schema valueSchema;

    public ConnectSchema(Type type, boolean optional, Object defaultValue, String name,
                         Integer version, String doc, List<Field> fields,
                         Schema keySchema, Schema valueSchema) {
        this.type = type;
        this.optional = optional;
        this.defaultValue = defaultValue;
        this.name = name;
        this.version = version;
        this.doc = doc;
        this.fields = fields == null ? null : Collections.unmodifiableList(fields);
        this.keySchema = keySchema;
        this.valueSchema = valueSchema;
    }

    public ConnectSchema(Type type) {
        this(type, false, null, null, null, null, null, null, null);
    }

    @Override
    public Type type() {
        return type;
    }

    @Override
    public boolean isOptional() {
        return optional;
    }

    @Override
    public Object defaultValue() {
        return defaultValue;
    }

    @Override
    public String name() {
        return name;
    }

    @Override
    public Integer version() {
        return version;
    }

    @Override
    public String doc() {
        return doc;
    }

    @Override
    public Schema keySchema() {
        return keySchema;
    }

    @Override
    public Schema valueSchema() {
        return valueSchema;
    }

    @Override
    public List<Field> fields() {
        if (type != Type.STRUCT)
            throw new IllegalStateException("Cannot list fields on non-struct type " + type);
        return fields;
    }

    @Override
    public Field field(String fieldName) {
        if (type != Type.STRUCT)
            throw new IllegalStateException("Cannot look up fields on non-struct type " + type);
        for (Field f : fields)
            if (f.name().equals(fieldName))
                return f;
        return null;
    }

    @Override
    public Schema schema() {
        return this;
    }

    @Override
    public boolean equals(Object o) {
        if (this == o) return true;
        if (!(o instanceof ConnectSchema)) return false;
        ConnectSchema s = (ConnectSchema) o;
        return type == s.type && optional == s.optional
                && Objects.equals(defaultValue, s.defaultValue)
                && Objects.equals(name, s.name)
                && Objects.equals(version, s.version)
                && Objects.equals(fields, s.fields)
                && Objects.equals(keySchema, s.keySchema)
                && Objects.equals(valueSchema, s.valueSchema);
    }

    @Override
    public int hashCode() {
        return Objects.hash(type, optional, defaultValue, name, version, fields, keySchema, valueSchema);
    }

    @Override
    public String toString() {
        return name != null ? "Schema{" + name + ":" + type + "}" : "Schema{" + type + "}";
    }
}
