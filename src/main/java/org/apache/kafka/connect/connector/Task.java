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

import java.util.Map;

public interface Task {
    String version();

    void start(Map<String, String> props);

    void stop();
}
