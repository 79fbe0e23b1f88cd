/*
 * Minimal binary-compatible declaration of the public Apache Kafka Connect
 * API (Apache-2.0). Vendored because this build environment cannot resolve
 * the org.apache.kafka:connect-api artifact (zero egress); in production,
 * drop the real connect-api jar on the classpath instead — signatures
 * match, so hosted connectors and the graft host link against either.
 */
package org.apache.kafka.connect.connector;

public interface ConnectorContext {
    void requestTaskReconfiguration();

    void raiseError(Exception e);
}
