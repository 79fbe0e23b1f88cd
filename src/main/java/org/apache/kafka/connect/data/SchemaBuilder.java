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

import java.util.ArrayList;
import java.util.List;

public class SchemaBuilder implements Schema {
    private final Type type;
    private boolean optional;
    private Object defaultValue;
    private String name;
    private Integer version;
    private String doc;
    private List<Field> fields;
    private Schema keySchema;
    private Schema valueSchema;

    public SchemaBuilder(Type type) {
        this.type = type;
        if (type == Type.STRUCT)
            this.fields = new ArrayList<>();
    }

    public static SchemaBuilder int8() {
        return new SchemaBuilder(Type.INT8);
    }

    public static SchemaBuilder int16() {
        return new SchemaBuilder(Type.INT16);
    }

    public static SchemaBuilder int32() {
        return new SchemaBuilder(Type.INT32);
    }

    public static SchemaBuilder int64() {
        return new SchemaBuilder(Type.INT64);
    }

    public static SchemaBuilder float32() {
        return new SchemaBuilder(Type.FLOAT32);
    }

    public static SchemaBuilder float64() {
        return new SchemaBuilder(Type.FLOAT64);
    }

    public static SchemaBuilder bool() {
        return new SchemaBuilder(Type.BOOLEAN);
    }

    public static SchemaBuilder string() {
        return new SchemaBuilder(Type.STRING);
    }

    public static SchemaBuilder bytes() {
        return new SchemaBuilder(Type.BYTES);
    }

    public static SchemaBuilder struct() {
        return new SchemaBuilder(Type.STRUCT);
    }

    public static SchemaBuilder type(Type type) {
        return new SchemaBuilder(type);
    }

    public static SchemaBuilder array(Schema valueSchema) {
        SchemaBuilder b = new SchemaBuilder(Type.ARRAY);
        b.valueSchema = valueSchema;
        return b;
    }

    public static SchemaBuilder map(Schema keySchema, Schema valueSchema) {
        SchemaBuilder b = new SchemaBuilder(Type.MAP);
        b.keySchema = keySchema;
        b.valueSchema = valueSchema;
        return b;
    }

    public SchemaBuilder optional() {
        this.optional = true;
        return this;
    }

    public SchemaBuilder required() {
        this.optional = false;
        return this;
    }

    public SchemaBuilder defaultValue(Object value) {
        this.defaultValue = value;
        return this;
    }

    public SchemaBuilder name(String name) {
        this.name = name;
        return this;
    }

    public SchemaBuilder version(Integer version) {
        this.version = version;
        return this;
    }

    public SchemaBuilder doc(String doc) {
        this.doc = doc;
        return this;
    }

    public SchemaBuilder field(String fieldName, Schema fieldSchema) {
        if (type != Type.STRUCT)
            throw new IllegalStateException("Cannot add fields to non-struct type " + type);
        fields.add(new Field(fieldName, fields.size(), fieldSchema));
        return this;
    }

    public Schema build() {
        return new ConnectSchema(type, optional, defaultValue, name, version, doc,
                fields, keySchema, valueSchema);
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
        return build().fields();
    }

    @Override
    public Field field(String fieldName) {
        return build().field(fieldName);
    }

    @Override
    public Schema schema() {
        return build();
    }
}
